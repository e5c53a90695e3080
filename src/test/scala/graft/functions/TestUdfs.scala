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
