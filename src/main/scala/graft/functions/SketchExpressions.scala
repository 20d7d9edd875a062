package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query side of the count-min sketch: Spark ships the builder
  * (`count_min_sketch(col, eps, confidence, seed)` aggregate → binary) but
  * no SQL-level estimator — the sketch is write-only from SQL. This
  * expression closes the loop: `graft_cms_estimate(sketch, item)` returns
  * the estimated count, so heavy-hitter certification runs as one query
  * (build sketch → broadcast the single-row binary → probe).
  *
  * Deserialization happens per evaluation, which is correct for the
  * intended shape — a handful of probe rows against a one-row sketch. A
  * per-row-scale probe (millions of estimates) should lift the sketch into
  * a broadcast variable once instead; that variant is driver code, not an
  * expression.
  */
object SketchKernels {
  def cmsEstimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}

/** cms_estimate(sketch binary, item integral) → estimated count (bigint).
  * checkInputDataTypes: a non-integral probe item (say a STRING column)
  * fails at analysis time with a clear message instead of a runtime
  * ClassCastException in interpreted eval. (ExpectsInputTypes would also
  * coerce, but its AbstractDataType signature is private[sql].) Narrower
  * integral probes (INT/SMALLINT/TINYINT) are accepted and widened — the
  * sketch hashes the widened long, identical to probing with a cast.
  */
case class CountMinEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate requires (BINARY, integral) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    SketchKernels.cmsEstimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) =>
      s"graft.functions.SketchKernels$$.MODULE$$.cmsEstimate($s, (long)($i))")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CountMinEstimateExpr = copy(left = newLeft, right = newRight)
}
