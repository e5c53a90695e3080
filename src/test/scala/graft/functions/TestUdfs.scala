package graft.functions

/** Reference-style UDF fixture: lifecycle trait + options-driven open
  * (transform.md:403-506 shape). Registered by classpath in specs.
  */
class AddNUdf extends UserDefinedFunction {
  private var n = 1
  override def open(options: Map[String, String]): Unit =
    n = options.get("n").map(_.toInt).getOrElse(1)
  def eval(v: java.lang.Integer): java.lang.Integer =
    if (v == null) null else Integer.valueOf(v.intValue() + n)
}

/** Plain class with just a public eval — the minimal contract (no trait,
  * no lifecycle), like a bare Flink ScalarFunction.
  */
class BangUdf extends Serializable {
  def eval(s: String): String = if (s == null) null else s + "!"
}

/** 3-arg printf-style formatter — the reference's FormatFunctionClass
  * (flink-cdc-pipeline-udf-examples/.../FormatFunctionClass.java).
  */
class FormatUdf extends Serializable {
  def eval(a: String, b: String, c: String): String = s"from $a to $b is $c"
}

/** String-increment — the reference's AddOneFunctionClass shape. */
class AddOneUdf extends Serializable {
  def eval(s: String): String =
    if (s == null) null else String.valueOf(s.toInt + 1)
}

/** Overloaded eval resolved per call at runtime — the reference's
  * TypeOfFunctionClass (testOverloadedUdf).
  */
class TypeOfUdf extends Serializable {
  def eval(b: java.lang.Boolean): String = "Boolean: " + b
  def eval(i: java.lang.Integer): String = "Integer: " + i
  def eval(f: java.lang.Float): String = "Float: " + f
  def eval(d: java.lang.Double): String = "Double: " + d
  def eval(s: String): String = "String: " + s
}

/** Opaque eval return type with an explicit type hint — the reference's
  * TypeHintFunctionClass (getReturnType STRING, testTypeHintedUdf).
  */
class TypeHintUdf extends UserDefinedFunction {
  override def returnType: Option[org.apache.spark.sql.types.DataType] =
    Some(org.apache.spark.sql.types.StringType)
  def eval(s: String): Object = ("typehint: " + s): Object
}
