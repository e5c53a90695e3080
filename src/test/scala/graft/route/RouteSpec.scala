package graft.route

import graft.model.TableId
import org.scalatest.funsuite.AnyFunSuite

class RouteSpec extends AnyFunSuite {

  test("selector: dot is separator, backslash-dot is regex token") {
    val s = Selectors.includeTables("mydb.orders_\\.*")
    assert(s.isMatch(TableId.parse("mydb.orders_1")))
    assert(s.isMatch(TableId.parse("mydb.orders_abc")))
    assert(!s.isMatch(TableId.parse("otherdb.orders_1")))
  }

  test("selector: comma-separated list, part-count sensitive") {
    val s = Selectors.includeTables("db1.t1, db2.t2")
    assert(s.isMatch(TableId.parse("db1.t1")))
    assert(s.isMatch(TableId.parse("db2.t2")))
    assert(!s.isMatch(TableId.parse("db1.t2")))
    // single-part id matches only on table name
    val single = Selectors.includeTables("t\\d+")
    assert(single.isMatch(TableId.tableOnly("t42")))
    assert(!single.isMatch(TableId.tableOnly("x42")))
  }

  test("router: sharded tables merge to one sink table") {
    val r = new TableIdRouter(Seq(RouteRule("db.tbl_\\.*", "db.merged")))
    assert(r.route(TableId.parse("db.tbl_1")) === Seq(TableId.parse("db.merged")))
    assert(r.route(TableId.parse("db.tbl_2")) === Seq(TableId.parse("db.merged")))
    // unmatched tables pass through unchanged
    assert(r.route(TableId.parse("db.other")) === Seq(TableId.parse("db.other")))
  }

  test("router: replace-symbol substitution") {
    val r = new TableIdRouter(Seq(
      RouteRule("source_db.\\.*", "sink_db.<t>", replaceSymbol = Some("<t>"))))
    assert(r.route(TableId.parse("source_db.users")) === Seq(TableId.parse("sink_db.users")))
  }

  test("router: one source can fan out to N sinks (ALL_MATCH)") {
    val r = new TableIdRouter(Seq(
      RouteRule("db.t1", "db.a"),
      RouteRule("db.t\\.*", "db.b")))
    assert(r.route(TableId.parse("db.t1")) ===
      Seq(TableId.parse("db.a"), TableId.parse("db.b")))
    val first = new TableIdRouter(Seq(
      RouteRule("db.t1", "db.a"),
      RouteRule("db.t\\.*", "db.b")), RouteMode.FirstMatch)
    assert(first.route(TableId.parse("db.t1")) === Seq(TableId.parse("db.a")))
  }

  test("router: capture-group replacement") {
    val r = new TableIdRouter(Seq(RouteRule("db.(\\.*)", "sink.$1")))
    assert(r.route(TableId.parse("db.users")) === Seq(TableId.parse("sink.users")))
  }

  test("groupByRule groups shards for schema merging") {
    val r = new TableIdRouter(Seq(RouteRule("db.shard_\\.*", "db.all")))
    val groups = r.groupByRule(Set(
      TableId.parse("db.shard_1"), TableId.parse("db.shard_2"),
      TableId.parse("db.other")))
    assert(groups === Seq(Set(TableId.parse("db.shard_1"), TableId.parse("db.shard_2"))))
  }
}
