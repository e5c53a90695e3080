package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's include/exclude resolution matrix —
  * `YamlPipelineDefinitionParserTest.testSchemaEvolutionTypesConfiguration`
  * + `testCreateTableAutoAddedToIncludedSchemaChanges` (FLINK-37837) —
  * against [[SchemaEvolutionTypes.resolveIncluded]]. Kind names are the
  * graft spellings of the reference's SchemaChangeEventType enum.
  */
class SchemaEvolutionTypesSpec extends AnyFunSuite {
  import SchemaChangeBehavior._

  private val all = Set("create.table", "add.column", "drop.column",
    "rename.column", "alter.column.type", "alter.table.comment",
    "drop.table", "truncate.table")

  private def resolve(b: SchemaChangeBehavior,
      inc: Option[Seq[String]], exc: Option[Seq[String]]): Set[String] =
    SchemaEvolutionTypes.resolveIncluded(b, inc, exc)

  test("family membership matches SchemaChangeEventTypeFamily exactly") {
    import graft.model.SchemaChangeEvent.families
    assert(families("add") === Set("add.column"))
    assert(families("alter") === Set("alter.column.type")) // comment is TABLE-only
    assert(families("create") === Set("create.table"))
    assert(families("drop") === Set("drop.column", "drop.table"))
    assert(families("rename") === Set("rename.column"))
    assert(families("table") === Set(
      "create.table", "drop.table", "truncate.table", "alter.table.comment"))
    assert(families("column") === Set(
      "add.column", "alter.column.type", "drop.column", "rename.column"))
    assert(families("all") === all)
  }

  test("ChangeEventUtils.resolveSchemaEvolutionOptions parity (plain expand minus expand)") {
    import graft.model.SchemaChangeEvent.expand
    // the low-level utility has NO create auto-add — that is parser-level
    // (ChangeEventUtilsTest.java:44-97)
    def low(inc: Seq[String], exc: Seq[String]) = expand(inc) -- expand(exc)
    val allTags = all.toSeq
    assert(low(allTags, Nil) === all)
    assert(low(allTags, Seq("drop")) === all -- Set("drop.column", "drop.table"))
    assert(low(Seq("create", "add"), Nil) === Set("create.table", "add.column"))
    assert(low(Seq("column"), Seq("drop.column")) ===
      Set("add.column", "alter.column.type", "rename.column"))
    assert(low(allTags, Seq("drop.column")) === all - "drop.column")
  }

  test("evolve/try_evolve with no lists include every kind") {
    assert(resolve(Evolve, None, None) === all)
    assert(resolve(TryEvolve, None, None) === all)
  }

  test("families expand on both sides, exclude wins") {
    // evolve, include [column, table], exclude [drop]
    assert(resolve(Evolve, Some(Seq("column", "table")), Some(Seq("drop"))) ===
      Set("alter.table.comment", "add.column", "alter.column.type",
        "create.table", "rename.column", "truncate.table"))
  }

  test("LENIENT defaults to excluding drop.table + truncate.table") {
    assert(resolve(Lenient, None, None) ===
      all -- Set("drop.table", "truncate.table"))
  }

  test("an explicit EMPTY exclude disables the lenient default") {
    assert(resolve(Lenient, None, Some(Nil)) === all)
  }

  test("an explicit EMPTY include resolves like an absent one (include ALL)") {
    // the reference branches on includedSETypes.isEmpty()
    // (YamlPipelineDefinitionParser.java:227-232), which cannot tell
    // `include: []` apart from no include key at all — both include ALL
    // (minus the LENIENT default excludes when no exclude key is given)
    assert(resolve(Evolve, Some(Nil), None) === all)
    assert(resolve(Lenient, Some(Nil), None) ===
      all -- Set("drop.table", "truncate.table"))
    // ... and the empty-include + empty-exclude corner keeps both rules
    assert(resolve(Lenient, Some(Nil), Some(Nil)) === all)
  }

  test("create.table auto-adds to a user include list (FLINK-37837)") {
    // case 1: only add.column declared
    assert(resolve(Evolve, Some(Seq("add.column")), None) ===
      Set("add.column", "create.table"))
    // case 2: the column family
    assert(resolve(Evolve, Some(Seq("column")), None) ===
      Set("add.column", "alter.column.type", "drop.column",
        "rename.column", "create.table"))
    // case 6: already included — no duplicate, same set
    assert(resolve(Evolve, Some(Seq("add.column", "create.table")), None) ===
      Set("add.column", "create.table"))
    // case 7: lenient with a user include — auto-add still applies
    assert(resolve(Lenient, Some(Seq("add.column")), None) ===
      Set("add.column", "create.table"))
  }

  test("an explicit create exclusion suppresses the auto-add") {
    // case 3: excluded directly
    assert(resolve(Evolve, Some(Seq("add.column")), Some(Seq("create.table"))) ===
      Set("add.column"))
    // case 4: excluded via the create family
    assert(resolve(Evolve, Some(Seq("add.column")), Some(Seq("create"))) ===
      Set("add.column"))
    // case 5: excluded via the table family
    assert(resolve(Evolve,
      Some(Seq("add.column", "alter.column.type")), Some(Seq("table"))) ===
      Set("add.column", "alter.column.type"))
  }
}
