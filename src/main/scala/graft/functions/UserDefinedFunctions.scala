package graft.functions

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** The reference's UDF surface
  * (flink-cdc-common/.../udf/UserDefinedFunction.java; lifecycle +
  * registration semantics in docs/core-concept/transform.md:403-506):
  * a scalar function with an open/close lifecycle receiving the pipeline
  * options map. Registered UDFs are callable from transform projections
  * and filters by name.
  */
trait UserDefinedFunction extends Serializable {
  /** One-time initialization with the `pipeline.user-defined-function.*`
    * options (connection setup, model loading, ...). Called lazily on
    * each executor before the first eval.
    */
  def open(options: Map[String, String]): Unit = ()
  def close(): Unit = ()
}

/** Typed single-argument scalar UDF. For wider arities, register plain
  * Scala functions via [[UdfRegistry.register2]] / `spark.udf`.
  */
abstract class ScalarUdf1[I, O] extends UserDefinedFunction {
  def eval(in: I): O
}

/** Registers reference-style UDFs on a session. The open/close lifecycle
  * maps onto lazy transient initialization inside the serialized closure:
  * `open` runs once per executor JVM (not per row), mirroring the
  * reference's operator-open call.
  */
object UdfRegistry {

  def register[I, O](spark: SparkSession, name: String, udf: ScalarUdf1[I, O],
      options: Map[String, String] = Map.empty)(
      implicit ie: reflect.runtime.universe.TypeTag[I],
      oe: reflect.runtime.universe.TypeTag[O]): Unit = {
    val opened = new ThreadSafeOnce(udf, options)
    spark.udf.register(name, (in: I) => { opened.ensureOpen(); udf.eval(in) })
    ()
  }

  def register2[I1, I2, O](spark: SparkSession, name: String, f: (I1, I2) => O)(
      implicit i1: reflect.runtime.universe.TypeTag[I1],
      i2: reflect.runtime.universe.TypeTag[I2],
      oe: reflect.runtime.universe.TypeTag[O]): Unit = {
    spark.udf.register(name, f)
    ()
  }

  private final class ThreadSafeOnce(udf: UserDefinedFunction,
      options: Map[String, String]) extends Serializable {
    @transient private lazy val done: Unit = udf.open(options)
    def ensureOpen(): Unit = done
  }
}
