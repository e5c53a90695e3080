package graft.route

import graft.model.TableId
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `TableIdRouterTest` (flink-cdc-runtime/src/test/
  * java/.../common/route/TableIdRouterTest.java) over the SchemaTestBase
  * routing fixture (SchemaTestBase.java:41-77): implicit/one-to-one/
  * twisted/merging/broadcasting/replace-symbol routes, the
  * table-list→regex conversion, per-rule source grouping, and the
  * standard-RegExp capturing-group replacement matrix.
  */
class RouteParitySpec extends AnyFunSuite {

  // SchemaTestBase.ROUTING_RULES, verbatim
  private val rules = Seq(
    // one-to-one routes
    RouteRule("db_1.table_1", "db_1.table_1"),
    RouteRule("db_1.table_2", "db_1.table_2"),
    RouteRule("db_1.table_3", "db_1.table_3"),
    // twisted one-to-one routes
    RouteRule("db_2.table_1", "db_2.table_2"),
    RouteRule("db_2.table_2", "db_2.table_3"),
    RouteRule("db_2.table_3", "db_2.table_1"),
    // merging routes
    RouteRule("db_3.table_\\.*", "db_3.table_merged"),
    // broadcasting routes
    RouteRule("db_4.table_1", "db_4.table_a"),
    RouteRule("db_4.table_1", "db_4.table_b"),
    RouteRule("db_4.table_1", "db_4.table_c"),
    RouteRule("db_4.table_2", "db_4.table_b"),
    RouteRule("db_4.table_2", "db_4.table_c"),
    RouteRule("db_4.table_3", "db_4.table_c"),
    // replacement symbol route
    RouteRule("db_5.table_\\.*", "db_5.prefix_<>_suffix", Some("<>")),
    // irrelevant route
    RouteRule("foo", "bar"),
    // standard RegExp capturing rules
    RouteRule("re_\\d+.table_(\\.*)", "database.another_table_with_$1$1$1_index"),
    RouteRule("(inv_\\d+).(table_\\.*)", "$2.$1"))

  private val router = new TableIdRouter(rules, RouteMode.AllMatch)

  private def route(t: String): Seq[String] =
    router.route(TableId.parse(t)).map(_.identifier)

  test("converting debezium table list to standard regex (testConvert)") {
    assert(TableIdRouter.tableListToRegex("foo.bar") === "foo\\.bar")
    assert(TableIdRouter.tableListToRegex("foo.bar,foo.baz") === "foo\\.bar|foo\\.baz")
    assert(TableIdRouter.tableListToRegex("db.\\.*") === "db\\..*")
  }

  test("implicit route: unmatched tables route to themselves") {
    assert(route("db_0.table_1") === Seq("db_0.table_1"))
    assert(route("db_0.table_2") === Seq("db_0.table_2"))
    assert(route("db_0.table_3") === Seq("db_0.table_3"))
  }

  test("one-to-one and twisted one-to-one routes") {
    assert(route("db_1.table_1") === Seq("db_1.table_1"))
    assert(route("db_1.table_2") === Seq("db_1.table_2"))
    assert(route("db_1.table_3") === Seq("db_1.table_3"))
    assert(route("db_2.table_1") === Seq("db_2.table_2"))
    assert(route("db_2.table_2") === Seq("db_2.table_3"))
    assert(route("db_2.table_3") === Seq("db_2.table_1"))
  }

  test("merging tables route") {
    assert(route("db_3.table_1") === Seq("db_3.table_merged"))
    assert(route("db_3.table_2") === Seq("db_3.table_merged"))
    assert(route("db_3.table_3") === Seq("db_3.table_merged"))
  }

  test("broadcasting route: one source fans out to several sinks") {
    assert(route("db_4.table_1").toSet === Set("db_4.table_a", "db_4.table_b", "db_4.table_c"))
    assert(route("db_4.table_2").toSet === Set("db_4.table_b", "db_4.table_c"))
    assert(route("db_4.table_3") === Seq("db_4.table_c"))
  }

  test("replacement-symbol route") {
    assert(route("db_5.table_1") === Seq("db_5.prefix_table_1_suffix"))
    assert(route("db_5.table_2") === Seq("db_5.prefix_table_2_suffix"))
    assert(route("db_5.table_3") === Seq("db_5.prefix_table_3_suffix"))
  }

  test("groupSourceTablesByRouteRule: one set per rule, empties for unmatched rules") {
    val tables = (1 to 5).flatMap(d => (1 to 3).map(t =>
      TableId.parse(s"db_$d.table_$t"))).toSet
    val groups = router.groupByRule(tables)
    def ids(names: String*): Set[TableId] = names.map(TableId.parse).toSet
    val expected = Seq(
      ids("db_1.table_1"), ids("db_1.table_2"), ids("db_1.table_3"),
      ids("db_2.table_1"), ids("db_2.table_2"), ids("db_2.table_3"),
      ids("db_3.table_1", "db_3.table_2", "db_3.table_3"),
      ids("db_4.table_1"), ids("db_4.table_1"), ids("db_4.table_1"),
      ids("db_4.table_2"), ids("db_4.table_2"), ids("db_4.table_3"),
      ids("db_5.table_1", "db_5.table_2", "db_5.table_3"),
      Set.empty[TableId], Set.empty[TableId], Set.empty[TableId])
    assert(groups.sortBy(_.toSeq.map(_.identifier).sorted.mkString(",")) ===
      expected.sortBy(_.toSeq.map(_.identifier).sorted.mkString(",")))
  }

  test("standard RegExp capturing-group expressions") {
    assert(route("re_1.table_1") === Seq("database.another_table_with_111_index"))
    assert(route("re_22.table_22") === Seq("database.another_table_with_222222_index"))
    assert(route("re_333.table_333") === Seq("database.another_table_with_333333333_index"))
    assert(route("inv_1.table_foo") === Seq("table_foo.inv_1"))
    assert(route("inv_22.table_bar") === Seq("table_bar.inv_22"))
    assert(route("inv_333.table_baz") === Seq("table_baz.inv_333"))
  }

  test("complex RegExp routing matrix (testRegExpComplexRouting)") {
    val tables = Seq("db1.tbl1", "db1.tbl2", "db1.tbl3", "db2.tbl2", "db2.tbl3", "db3.tbl3")
    def std(src: String, sink: String): Seq[String] = {
      val r = new TableIdRouter(Seq(RouteRule(src, sink)), RouteMode.AllMatch)
      tables.map(t => r.route(TableId.parse(t)).map(_.identifier).mkString(","))
    }
    assert(std("db1.(\\.*)", "db1.combined") === Seq(
      "db1.combined", "db1.combined", "db1.combined", "db2.tbl2", "db2.tbl3", "db3.tbl3"))
    assert(std("db1.(\\.*)", "db1.pre_$1") === Seq(
      "db1.pre_tbl1", "db1.pre_tbl2", "db1.pre_tbl3", "db2.tbl2", "db2.tbl3", "db3.tbl3"))
    assert(std("db1.(\\.*)", "db1.$1_suf") === Seq(
      "db1.tbl1_suf", "db1.tbl2_suf", "db1.tbl3_suf", "db2.tbl2", "db2.tbl3", "db3.tbl3"))
    assert(std("db1.tbl(\\.*)", "db1.no$1") === Seq(
      "db1.no1", "db1.no2", "db1.no3", "db2.tbl2", "db2.tbl3", "db3.tbl3"))
    assert(std("(\\.*).tbl3", "pre_$1.tbl3") === Seq(
      "db1.tbl1", "db1.tbl2", "pre_db1.tbl3", "db2.tbl2", "pre_db2.tbl3", "pre_db3.tbl3"))
    assert(std("(\\.*).tbl3", "$1_suf.tbl3") === Seq(
      "db1.tbl1", "db1.tbl2", "db1_suf.tbl3", "db2.tbl2", "db2_suf.tbl3", "db3_suf.tbl3"))
    assert(std("db(\\.*).(tbl\\.*)", "no$1.$2") === Seq(
      "no1.tbl1", "no1.tbl2", "no1.tbl3", "no2.tbl2", "no2.tbl3", "no3.tbl3"))
    assert(std("db(\\.*).tbl(\\.*)", "Database$1.Collection$2") === Seq(
      "Database1.Collection1", "Database1.Collection2", "Database1.Collection3",
      "Database2.Collection2", "Database2.Collection3", "Database3.Collection3"))
  }
}
