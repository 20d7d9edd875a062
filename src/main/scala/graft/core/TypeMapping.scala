package graft.core

import org.apache.spark.sql.types._

/** Schema-level type/dialect mapping.
  *
  * The reference maps SQLite type names to warehouse type names by blind
  * substring replacement over the whole serialized SQL text
  * (/root/reference/pipeline.py:117-140) — which corrupts data values (a cell
  * containing "CONTEXT" becomes "CONVARCHAR"). Here the mapping operates on
  * the schema only: names map to Spark `DataType`s and a `StructType` renders
  * to DDL via Catalyst's own `toDDL`, so row data is never touched.
  */
object TypeMapping {

  /** One schema-drift finding between an expected and an observed schema. */
  sealed trait SchemaDrift { def column: String }
  final case class ColumnAdded(column: String, newType: String) extends SchemaDrift
  final case class ColumnRemoved(column: String, oldType: String) extends SchemaDrift
  final case class TypeChanged(column: String, oldType: String, newType: String) extends SchemaDrift

  /** Compare two schemas (e.g. yesterday's ingested table vs today's
    * inferred CSV) and report drift — the check an automated ingest runs
    * before appending, since silent inference drift is exactly the failure
    * mode the reference's per-chunk inference had (SURVEY.md §0.2-7) at
    * file granularity.
    */
  def schemaDrift(expected: org.apache.spark.sql.types.StructType,
                  observed: org.apache.spark.sql.types.StructType): Seq[SchemaDrift] = {
    val exp = expected.fields.map(f => f.name -> f.dataType).toMap
    val obs = observed.fields.map(f => f.name -> f.dataType).toMap
    val added = observed.fields.filterNot(f => exp.contains(f.name))
      .map(f => ColumnAdded(f.name, f.dataType.simpleString))
    val removed = expected.fields.filterNot(f => obs.contains(f.name))
      .map(f => ColumnRemoved(f.name, f.dataType.simpleString))
    val changed = expected.fields
      .filter(f => obs.get(f.name).exists(_ != f.dataType))
      .map(f => TypeChanged(f.name, f.dataType.simpleString, obs(f.name).simpleString))
    (added ++ removed ++ changed).toSeq.sortBy(_.column)
  }

  /** Source-dialect (SQLite) type name → Spark DataType. Covers the
    * reference's full 13-entry table (/root/reference/pipeline.py:117-131).
    * TIME has no Spark equivalent and is represented as TimestampType
    * (date part zeroed by convention); INTERVAL maps to DayTimeIntervalType.
    */
  val sqliteToSpark: Map[String, DataType] = Map(
    "INTEGER"   -> IntegerType,
    "TEXT"      -> StringType,
    "REAL"      -> FloatType,
    "BLOB"      -> BinaryType,
    "BOOLEAN"   -> BooleanType,
    "DATE"      -> DateType,
    "FLOAT"     -> FloatType,
    "DECIMAL"   -> DecimalType.SYSTEM_DEFAULT,
    "DOUBLE"    -> DoubleType,
    "INTERVAL"  -> DayTimeIntervalType(),
    "BIGINT"    -> LongType,
    "TIME"      -> TimestampType, // no TIME type in Spark; documented deviation
    "TIMESTAMP" -> TimestampType
  )

  /** Spark DataType → warehouse-facing SQL type name (the reference's target
    * dialect names, /root/reference/pipeline.py:117-131). Used when emitting
    * DDL for external systems; for Spark-internal DDL prefer
    * `StructType.toDDL`.
    */
  def toWarehouseTypeName(dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType => "INT"
    case StringType                         => "VARCHAR"
    case FloatType                          => "FLOAT"
    case BinaryType                         => "VARBINARY"
    case BooleanType                        => "BOOLEAN"
    case DateType                           => "DATE"
    case d: DecimalType                     => s"DECIMAL(${d.precision}, ${d.scale})"
    case DoubleType                         => "DOUBLE"
    case _: DayTimeIntervalType             => "INTERVAL"
    case _: YearMonthIntervalType           => "INTERVAL"
    case LongType                           => "BIGINT"
    case TimestampType | TimestampNTZType   => "TIMESTAMP"
    case other                              => other.sql
  }

  /** Parse a source-dialect type name (case-insensitive, optional
    * precision/scale suffix ignored for the base lookup) to a Spark type.
    */
  def parseSourceType(name: String): Option[DataType] = {
    val base = name.trim.toUpperCase.takeWhile(c => c != '(' && c != ' ')
    sqliteToSpark.get(base)
  }

  /** Translate a schema expressed with source-dialect names into a Spark
    * StructType — the schema-level replacement for the reference's
    * text-rewrite (`convert_sqlite_to_dremio`).
    */
  def schemaFromSource(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (fieldName, typeName) =>
      StructField(fieldName, parseSourceType(typeName).getOrElse(StringType))
    })

  /** Render a CREATE TABLE statement for a warehouse dialect from a Spark
    * schema — replaces the reference's per-chunk iterdump+string-replace path
    * (/root/reference/pipeline.py:212-240).
    */
  def createTableDdl(qualifiedName: String, schema: StructType): String = {
    val cols = schema.fields
      .map(f => s""""${f.name}" ${toWarehouseTypeName(f.dataType)}""")
      .mkString(", ")
    s"""CREATE TABLE $qualifiedName ($cols)"""
  }
}
