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

  /** Optional return-type override, the reference's `getReturnType`
    * (UserDefinedFunction.java) — None infers from `eval`'s Java
    * signature.
    */
  def returnType: Option[org.apache.spark.sql.types.DataType] = None
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

  /** Reflectively register a UDF declared by classpath — the YAML
    * `user-defined-function:` block contract
    * (YamlPipelineDefinitionParser.java:310-338, transform.md:403-506):
    * a public no-arg constructor and a public `eval` method; classes
    * implementing [[UserDefinedFunction]] additionally get the open/close
    * lifecycle and may override `returnType`. The instance must be
    * Serializable (it ships inside the task closure).
    */
  def registerByClasspath(spark: SparkSession, name: String, classpath: String,
      options: Map[String, String] = Map.empty): Unit = {
    // instantiation failures surface as the reference's message
    // (UserDefinedFunctionDescriptor.java, pinned by its descriptor test:
    // "Failed to instantiate UDF not_even_exist@not.a.valid.class.path")
    val (cls, instance) =
      try {
        val c = Class.forName(classpath)
        (c, c.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef])
      } catch {
        case e: ReflectiveOperationException =>
          throw new IllegalArgumentException(
            s"Failed to instantiate UDF $name@$classpath", e)
      }
    val evals = cls.getMethods.filter(m =>
      m.getName == "eval" && !m.isBridge && !m.isSynthetic)
    require(evals.nonEmpty, s"$classpath has no public eval method")
    // Overloaded evals resolve per CALL at runtime (the reference resolves
    // them per call site in codegen — FlinkPipelineUdfITCase
    // .testOverloadedUdf): a registered SQL function binds one name, one
    // arity and one return type, so overloads must agree on both; the
    // dispatcher then picks the overload matching the runtime argument
    // classes (with BigDecimal->Double style literal widening).
    require(evals.map(_.getParameterCount).distinct.length == 1,
      s"$classpath eval overloads span arities " +
        s"${evals.map(_.getParameterCount).distinct.sorted.mkString(",")} — " +
        "a registered SQL function binds ONE arity; split across names")
    val eval = evals.head
    val rt: org.apache.spark.sql.types.DataType = instance match {
      case u: UserDefinedFunction if u.returnType.isDefined => u.returnType.get
      case _ =>
        require(evals.map(_.getReturnType).distinct.length == 1,
          s"$classpath eval overloads disagree on the return type — " +
            "override returnType to pick the SQL type")
        sparkTypeOf(eval.getReturnType, classpath)
    }
    val opened = instance match {
      case u: UserDefinedFunction => Some(new ThreadSafeOnce(u, options))
      case _ => None
    }
    val fn = new ReflectiveCall(instance, cls.getName, eval.getName,
      evals.map(_.getParameterTypes.map(_.getName)), opened)
    import org.apache.spark.sql.api.java._
    eval.getParameterCount match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        def call(): Any = fn(Array.empty) }, rt)
      case 1 => spark.udf.register(name, new UDF1[AnyRef, Any] {
        def call(a: AnyRef): Any = fn(Array(a)) }, rt)
      case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, Any] {
        def call(a: AnyRef, b: AnyRef): Any = fn(Array(a, b)) }, rt)
      case 3 => spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, Any] {
        def call(a: AnyRef, b: AnyRef, c: AnyRef): Any = fn(Array(a, b, c)) }, rt)
      case n => throw new IllegalArgumentException(
        s"$classpath.eval arity $n unsupported (max 3)")
    }
    ()
  }

  /** Serializable eval dispatcher: re-resolves Methods on each executor
    * (java.lang.reflect.Method is not serializable), caches them, and —
    * when the UDF overloads eval — selects the overload matching the
    * runtime argument classes: exact match first, then assignability,
    * then numeric literal widening (a DECIMAL literal argument reaches an
    * eval(Double), an INT one an eval(Long), mirroring the reference's
    * call-site resolution).
    */
  private final class ReflectiveCall(
      instance: AnyRef, className: String, methodName: String,
      signatures: Array[Array[String]],
      opened: Option[ThreadSafeOnce]) extends Serializable {
    @transient private lazy val methods: Array[java.lang.reflect.Method] = {
      val cls = Class.forName(className)
      signatures.map(sig =>
        cls.getMethods.find(m => m.getName == methodName &&
          m.getParameterTypes.map(_.getName).sameElements(sig))
          .getOrElse(throw new IllegalStateException(s"$className.$methodName lost")))
    }
    private def boxed(c: Class[_]): Class[_] = c.getName match {
      case "int" => classOf[java.lang.Integer]
      case "long" => classOf[java.lang.Long]
      case "double" => classOf[java.lang.Double]
      case "float" => classOf[java.lang.Float]
      case "boolean" => classOf[java.lang.Boolean]
      case "short" => classOf[java.lang.Short]
      case "byte" => classOf[java.lang.Byte]
      case "char" => classOf[java.lang.Character]
      case _ => c
    }
    /** Widen `v` into parameter class `p` if a standard numeric widening
      * applies; None when it doesn't fit.
      */
    private def widen(v: AnyRef, p: Class[_]): Option[AnyRef] = (v, p.getName) match {
      case (d: java.math.BigDecimal, "java.lang.Double") => Some(Double.box(d.doubleValue))
      case (d: java.math.BigDecimal, "java.lang.Float") => Some(Float.box(d.floatValue))
      case (i: java.lang.Integer, "java.lang.Long") => Some(Long.box(i.longValue))
      case (i: java.lang.Integer, "java.lang.Double") => Some(Double.box(i.doubleValue))
      case (l: java.lang.Long, "java.lang.Double") => Some(Double.box(l.doubleValue))
      case (f: java.lang.Float, "java.lang.Double") => Some(Double.box(f.doubleValue))
      case _ => None
    }
    def apply(args: Array[AnyRef]): Any = {
      opened.foreach(_.ensureOpen())
      if (methods.length == 1) return methods(0).invoke(instance, args: _*)
      def params(m: java.lang.reflect.Method) = m.getParameterTypes.map(boxed)
      val exact = methods.find(m => params(m).zip(args).forall {
        case (p, null) => true
        case (p, a) => p == a.getClass
      })
      val chosen = exact.orElse(
        methods.find(m => params(m).zip(args).forall {
          case (p, null) => true
          case (p, a) => p.isAssignableFrom(a.getClass)
        })).map(m => (m, args))
        .orElse {
          // widening pass: every arg must fit exactly or widen
          methods.iterator.map { m =>
            val ps = params(m)
            val converted = ps.zip(args).map {
              case (_, null) => Some(null: AnyRef)
              case (p, a) if p == a.getClass || p.isAssignableFrom(a.getClass) => Some(a)
              case (p, a) => widen(a, p)
            }
            if (converted.forall(_.isDefined)) Some((m, converted.map(_.get)))
            else None
          }.collectFirst { case Some(x) => x }
        }
        .getOrElse(throw new IllegalArgumentException(
          s"$className.$methodName: no overload accepts (" +
            args.map(a => if (a == null) "null" else a.getClass.getSimpleName)
              .mkString(", ") + ")"))
      chosen._1.invoke(instance, chosen._2: _*)
    }
  }

  /** Java eval signature -> Spark type, for UDFs without an explicit
    * returnType.
    */
  private def sparkTypeOf(c: Class[_], where: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    c.getName match {
      case "java.lang.String" => StringType
      case "int" | "java.lang.Integer" => IntegerType
      case "long" | "java.lang.Long" => LongType
      case "double" | "java.lang.Double" => DoubleType
      case "float" | "java.lang.Float" => FloatType
      case "boolean" | "java.lang.Boolean" => BooleanType
      case "short" | "java.lang.Short" => ShortType
      case "byte" | "java.lang.Byte" => ByteType
      case "[B" => BinaryType
      case "java.math.BigDecimal" => DecimalType(38, 18)
      case "java.sql.Timestamp" => TimestampType
      case "java.sql.Date" => DateType
      case other => throw new IllegalArgumentException(
        s"$where.eval returns $other — override returnType to register it")
    }
  }
}
