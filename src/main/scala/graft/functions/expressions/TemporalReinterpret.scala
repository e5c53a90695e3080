package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Zero-cost zone-free NTZ ↔ epoch-micros reinterprets.
  *
  * Catalyst stores a TIMESTAMP_NTZ as the micros-since-epoch of its wall
  * clock read as UTC — byte-for-byte the Connect wire definition the CDC
  * codecs need (io.debezium.time.MicroTimestamp). So the conversion both
  * ways is the IDENTITY on the storage long: no session zone anywhere in
  * the path (exact inside DST transition windows by construction), and
  * no per-row arithmetic (the field-arithmetic formulation these replace
  * measured ~25% of q79's wall at sf0.1). Codegen is a pass-through;
  * both stay inside whole-stage codegen.
  */
object TemporalReinterpret {

  private def expectType(e: Expression, t: DataType, name: String): TypeCheckResult =
    if (e.dataType == t) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ${t.simpleString}, got ${e.dataType.simpleString}")

  /** TIMESTAMP_NTZ → BIGINT epoch micros of the wall clock read as UTC. */
  case class NtzToMicros(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      expectType(child, TimestampNTZType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "ntz_to_micros"
    override protected def nullSafeEval(input: Any): Any = input // both Long
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(newChild: Expression): NtzToMicros =
      copy(child = newChild)
  }

  /** BIGINT epoch micros → the TIMESTAMP_NTZ whose wall clock is the UTC
    * reading.
    */
  case class MicrosToNtz(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      expectType(child, LongType, prettyName)
    override def dataType: DataType = TimestampNTZType
    override def prettyName: String = "micros_to_ntz"
    override protected def nullSafeEval(input: Any): Any = input // both Long
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(newChild: Expression): MicrosToNtz =
      copy(child = newChild)
  }
}
