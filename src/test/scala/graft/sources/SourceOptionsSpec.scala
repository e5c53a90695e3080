package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The typed incremental-source option surface
  * (MySqlDataSourceOptions parity): defaults, parsing, typo rejection,
  * passthrough namespaces.
  */
class SourceOptionsSpec extends AnyFunSuite {

  test("36 options with reference defaults") {
    assert(SourceOptions.all.size === 36)
    val r = SourceOptions.resolve(Map("hostname" -> "db1", "tables" -> "app.\\.*"))
    assert(r(SourceOptions.Hostname) === "db1")
    assert(r(SourceOptions.Port) === 3306)
    assert(r(SourceOptions.ScanChunkSize) === 8096)
    assert(r(SourceOptions.ChunkKeyEvenUpper) === 1000.0)
    assert(r(SourceOptions.ChunkKeyEvenLower) === 0.05)
    assert(r(SourceOptions.ScanStartupMode) === "initial")
    assert(r(SourceOptions.SchemaChangeEnabled) === true)
    assert(r(SourceOptions.TreatTinyInt1AsBoolean) === true)
    assert(r(SourceOptions.ConnectTimeout) === java.time.Duration.ofSeconds(30))
    assert(r.get(SourceOptions.ServerId).isEmpty)
  }

  test("typed parsing and duration formats") {
    val r = SourceOptions.resolve(Map(
      "port" -> "3307",
      "connect.timeout" -> "500ms",
      "heartbeat.interval" -> "5min",
      "scan.incremental.snapshot.chunk.size" -> "1024",
      "chunk-key.even-distribution.factor.upper-bound" -> "10.5",
      "scan.newly-added-table.enabled" -> "true"))
    assert(r(SourceOptions.Port) === 3307)
    assert(r(SourceOptions.ConnectTimeout) === java.time.Duration.ofMillis(500))
    assert(r(SourceOptions.HeartbeatInterval) === java.time.Duration.ofMinutes(5))
    assert(r(SourceOptions.ScanChunkSize) === 1024)
    assert(r(SourceOptions.ChunkKeyEvenUpper) === 10.5)
    assert(r(SourceOptions.ScanNewlyAddedTable) === true)
  }

  test("typos inside reserved prefixes fail fast; passthrough flows") {
    intercept[IllegalArgumentException](
      SourceOptions.resolve(Map("scan.startup.modee" -> "initial")))
    intercept[IllegalArgumentException](
      SourceOptions.resolve(Map("connect.timeot" -> "30s")))
    intercept[IllegalArgumentException](
      SourceOptions.resolve(Map("port" -> "not-a-number")))
    val r = SourceOptions.resolve(Map(
      "debezium.snapshot.mode" -> "never",
      "jdbc.properties.useSSL" -> "false",
      "custom-key" -> "ok")) // unreserved unknown keys pass
    assert(r.passthrough("debezium.") === Map("snapshot.mode" -> "never"))
    assert(r.passthrough("jdbc.properties.") === Map("useSSL" -> "false"))
  }

  test("pipeline runner rejects option typos at construction") {
    import graft.pipeline._
    val bad = PipelineDef(
      SourceDef("values", Map("scan.startup.modee" -> "initial")),
      SinkDef("values", Map.empty))
    intercept[IllegalArgumentException](new PipelineRunner(null, bad, null, null))
  }

  test("chunk options drive the splitter plan") {
    import JdbcChunkSplitter._
    val opts = SourceOptions.resolve(Map(
      "scan.incremental.snapshot.chunk.size" -> "1000",
      "scan.incremental.snapshot.chunk.key-column" -> "order_id",
      "chunk-key.even-distribution.factor.upper-bound" -> "2000.0"))
    val p = planFromOptions("id", KeyStats(0, 999999, 1000000), opts)
    assert(p.partitionColumn === "order_id")
    assert(p.numPartitions === 1000) // 1M keys / (1000 * factor 1.0)
    assert(p.evenlyDistributed)
    // defaults apply when options are absent
    val d = planFromOptions("id", KeyStats(0, 999999, 1000000),
      SourceOptions.resolve(Map.empty))
    assert(d.partitionColumn === "id")
    assert(d.numPartitions === math.ceil(1000000.0 / 8096).toInt)
  }

  test("startup options integrate with StartupMode") {
    val r = SourceOptions.resolve(Map(
      "scan.startup.mode" -> "timestamp",
      "scan.startup.timestamp-millis" -> "1700000000000"))
    assert(StartupMode.fromOptions(r.raw) === StartupMode.AtTimestamp(1700000000000L))
  }
}
