package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Comparable, structured change-stream positions — the offset ALGEBRA
  * behind `scan.startup.mode=specific-offset` and resume-from-checkpoint.
  *
  * The engine totally orders applied changes by the scalar `__seq`, but a
  * real resume request arrives in source-native coordinates ("start after
  * binlog file X pos Y with GTID set G"; "after LSN 16/B374D848"), and
  * deciding whether a feed event is past that point needs the source's own
  * ordering rules. This file re-expresses those rules from the reference's
  * per-connector Offset classes:
  *
  *  - MySQL binlog: BinlogOffset.java:172-266 — GTID sets dominate when
  *    present (set equality → skip-events/rows tiebreak, else containment
  *    decides), then server-id/timestamp for unrelated servers, then
  *    filename (LENGTH first, so "bin.9" < "bin.10", then name), position,
  *    skip-events, skip-rows. GTID set algebra after debezium's GtidSet
  *    (interval normalization + per-UUID containment).
  *  - Postgres/SQLServer/Db2 LSN: fixed-width unsigned hex segments,
  *    segment-wise numeric order (LsnOffset.java).
  *  - Oracle SCN: unbounded numeric (RedoLogOffset.java).
  *  - MongoDB change stream: cluster-timestamp order; the resume token is
  *    an opaque payload carried alongside (ChangeStreamOffset.java:43-95).
  *  - TiDB: resolved-ts numeric order.
  */
object Offsets {

  /** A source-native position; kinds are not mutually comparable (each
    * subclass carries its own total order).
    */
  sealed trait SourceOffset

  // ---------------------------------------------------------------- gtid

  /** MySQL GTID set, e.g. `uuid1:1-20:25,uuid2:1-5`. Intervals are kept
    * normalized (sorted, overlapping/adjacent runs merged) so structural
    * equality IS set equality — same contract as debezium's GtidSet that
    * the reference compares with.
    */
  final case class GtidSet(ranges: Map[String, Vector[(Long, Long)]]) {

    /** True iff every transaction id in this set is also in `other` —
      * per-UUID interval containment.
      */
    def isContainedWithin(other: GtidSet): Boolean =
      ranges.forall { case (uuid, ivs) =>
        other.ranges.get(uuid).exists { o =>
          ivs.forall { case (lo, hi) => o.exists(oi => oi._1 <= lo && hi <= oi._2) }
        }
      }

    def render: String = ranges.toSeq.sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (lo, hi) =>
        if (lo == hi) lo.toString else s"$lo-$hi" }.mkString(":")
    }.mkString(",")
  }

  object GtidSet {
    def parse(s: String): GtidSet = {
      val parts = s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { part =>
        val i = part.indexOf(':')
        require(i > 0 && i < part.length - 1, s"malformed GTID range: '$part'")
        val uuid = part.substring(0, i).toLowerCase
        val ivs = part.substring(i + 1).split(":").toVector.map { r =>
          r.split("-", 2) match {
            case Array(a) => (a.trim.toLong, a.trim.toLong)
            case Array(a, b) => (a.trim.toLong, b.trim.toLong)
          }
        }
        uuid -> ivs
      }.toVector
      val merged = parts.groupBy(_._1).map { case (uuid, vs) =>
        uuid -> normalize(vs.flatMap(_._2))
      }
      GtidSet(merged)
    }

    /** Sort by start and merge overlapping or adjacent intervals. */
    private def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] =
      ivs.sortBy(_._1).foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
        acc.lastOption match {
          case Some((lo, hi)) if iv._1 <= hi + 1 =>
            acc.init :+ (lo, math.max(hi, iv._2))
          case _ => acc :+ iv
        }
      }
  }

  // -------------------------------------------------------------- binlog

  /** MySQL binlog position with the reference's total order. Field roles
    * per BinlogOffset.java: `skipEvents`/`skipRows` resume inside a
    * multi-event transaction; `serverId`/`tsSec` disambiguate positions
    * from unrelated servers; `nonStopping` is the +∞ sentinel the hybrid
    * assigner uses for "stream forever".
    */
  final case class BinlogOffset(
      file: String = "",
      pos: Long = 0L,
      gtidSet: Option[GtidSet] = None,
      skipEvents: Long = 0L,
      skipRows: Long = 0L,
      serverId: Long = 0L,
      tsSec: Long = 0L,
      nonStopping: Boolean = false) extends SourceOffset with Ordered[BinlogOffset] {

    override def compare(that: BinlogOffset): Int = {
      // NON_STOPPING is the maximum offset
      if (this.nonStopping && that.nonStopping) return 0
      if (this.nonStopping) return 1
      if (that.nonStopping) return -1

      (this.gtidSet, that.gtidSet) match {
        case (Some(g), Some(tg)) =>
          // both have GTIDs: the sets decide entirely
          if (g == tg) {
            val e = java.lang.Long.compare(skipEvents, that.skipEvents)
            if (e != 0) e else java.lang.Long.compare(skipRows, that.skipRows)
          } else if (g.isContainedWithin(tg)) -1
          else 1
        // GTIDs are rarely disabled once on: the GTID-less side is older
        case (None, Some(_)) => -1
        case (Some(_), None) => 1
        case (None, None) =>
          // unrelated servers: only timestamps are comparable
          if (serverId != that.serverId && tsSec != 0 && that.tsSec != 0 &&
            tsSec != that.tsSec) {
            java.lang.Long.compare(tsSec, that.tsSec)
          } else {
            // filename LENGTH first ("bin.9" < "bin.10"), then name
            val byFile =
              if (file.equalsIgnoreCase(that.file)) 0
              else if (file.length != that.file.length)
                Integer.compare(file.length, that.file.length)
              else file.compareToIgnoreCase(that.file)
            if (byFile != 0) byFile
            else if (pos != that.pos) java.lang.Long.compare(pos, that.pos)
            else if (skipEvents != that.skipEvents)
              java.lang.Long.compare(skipEvents, that.skipEvents)
            else java.lang.Long.compare(skipRows, that.skipRows)
          }
      }
    }

    def isAtOrBefore(that: BinlogOffset): Boolean = compare(that) <= 0
    def isBefore(that: BinlogOffset): Boolean = compare(that) < 0
    def isAtOrAfter(that: BinlogOffset): Boolean = compare(that) >= 0
    def isAfter(that: BinlogOffset): Boolean = compare(that) > 0
  }

  object BinlogOffset {
    val NonStopping: BinlogOffset = BinlogOffset(nonStopping = true)
    val Earliest: BinlogOffset = BinlogOffset("", 0L)

    /** Build from `scan.startup.specific-offset.*` options (the five keys
      * of [[SourceOptions]]' startup group).
      */
    def fromOptions(opts: Map[String, String]): BinlogOffset = BinlogOffset(
      file = opts.getOrElse("scan.startup.specific-offset.file", ""),
      pos = opts.get("scan.startup.specific-offset.pos").map(_.toLong).getOrElse(0L),
      gtidSet = opts.get("scan.startup.specific-offset.gtid-set").map(GtidSet.parse),
      skipEvents = opts.get("scan.startup.specific-offset.skip-events")
        .map(_.toLong).getOrElse(0L),
      skipRows = opts.get("scan.startup.specific-offset.skip-rows")
        .map(_.toLong).getOrElse(0L))
  }

  // ----------------------------------------------------------- lsn / scn

  /** Fixed-tuple log sequence number ordered segment-wise; segments are
    * unsigned (compared as such). Postgres renders 2 hex segments
    * ("16/B374D848"), SQLServer 3 (":"-separated), Db2 a hex string.
    */
  final case class Lsn(segments: Vector[Long]) extends SourceOffset with Ordered[Lsn] {
    override def compare(that: Lsn): Int = {
      val n = math.max(segments.length, that.segments.length)
      var i = 0
      while (i < n) {
        val a = if (i < segments.length) segments(i) else 0L
        val b = if (i < that.segments.length) that.segments(i) else 0L
        val c = java.lang.Long.compareUnsigned(a, b)
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  object Lsn {
    /** Postgres pg_lsn `XXXXXXXX/XXXXXXXX`. */
    def parsePostgres(s: String): Lsn =
      Lsn(s.split("/").toVector.map(java.lang.Long.parseUnsignedLong(_, 16)))

    /** SQLServer / Db2 `00000025:00000448:0001` (any segment count). */
    def parseSqlServer(s: String): Lsn =
      Lsn(s.split(":").toVector.map(java.lang.Long.parseUnsignedLong(_, 16)))
  }

  /** Oracle system change number — unbounded numeric. */
  final case class Scn(value: BigInt) extends SourceOffset with Ordered[Scn] {
    override def compare(that: Scn): Int = value.compare(that.value)
  }

  object Scn {
    def parse(s: String): Scn = Scn(BigInt(s.trim))
  }

  /** MongoDB change-stream position: ordered by the BSON cluster
    * timestamp; the resume token is opaque payload (the reference decodes
    * the timestamp OUT of the token and compares that).
    */
  final case class ChangeStreamOffset(timestamp: Long, resumeToken: Option[String] = None)
      extends SourceOffset with Ordered[ChangeStreamOffset] {
    override def compare(that: ChangeStreamOffset): Int =
      java.lang.Long.compare(timestamp, that.timestamp)
  }

  object ChangeStreamOffset {
    private val KTimestamp = 0x82

    /** Decode the cluster timestamp OUT of a resume token's `_data`
      * payload (hex v0/v1 string, or base64 BinData): first byte must be
      * the kTimestamp tag 0x82, then big-endian (seconds, increment) —
      * ResumeTokenUtils.java:37-60. The offset's `timestamp` is the BSON
      * timestamp VALUE, `seconds << 32 | increment`, which is what the
      * change-stream order compares.
      */
    def fromResumeToken(data: String, base64: Boolean = false): ChangeStreamOffset = {
      val bytes =
        if (base64) java.util.Base64.getDecoder.decode(data)
        else {
          require(data.length % 2 == 0, s"odd-length resume token hex: $data")
          Array.tabulate(data.length / 2)(i =>
            Integer.parseInt(data.substring(2 * i, 2 * i + 2), 16).toByte)
        }
      require(bytes.length >= 9, s"resume token too short: ${bytes.length} bytes")
      val kType = bytes(0) & 0xff
      require(kType == KTimestamp, s"unknown keyType of timestamp: $kType")
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      buf.get()
      val t = buf.getInt()
      val i = buf.getInt()
      ChangeStreamOffset((t.toLong << 32) | (i.toLong & 0xffffffffL), Some(data))
    }
  }

  /** TiKV resolved-ts. */
  final case class ResolvedTs(ts: Long) extends SourceOffset with Ordered[ResolvedTs] {
    override def compare(that: ResolvedTs): Int = java.lang.Long.compare(ts, that.ts)
  }

  /** Vitess VGTID: a per-(keyspace, shard) GTID position. Positions of the
    * same shard order by set containment (partial order — concurrent
    * positions from diverged servers are incomparable, which is why this
    * exposes `isAtOrAfter` and not `Ordered`).
    */
  final case class VGtid(keyspace: String, shard: String, gtids: GtidSet)
      extends SourceOffset {
    def isAtOrAfter(that: VGtid): Boolean =
      keyspace == that.keyspace && shard == that.shard &&
        that.gtids.isContainedWithin(gtids)
  }

  // -------------------------------------------------- catalyst predicate

  /** Feed rows at-or-after a binlog `target`, as a plain boolean Column
    * over the feed's (file, pos) coordinate columns — the no-GTID branch
    * of [[BinlogOffset.compare]] (length, then case-insensitive name,
    * then pos) expressed in Catalyst so it stays codegen'd and eligible
    * for pushdown into the feed scan.
    */
  def binlogAtOrAfter(file: Column, pos: Column, target: BinlogOffset): Column = {
    val f = lower(file)
    val tf = lit(target.file.toLowerCase)
    val flen = length(file)
    val tlen = lit(target.file.length)
    (flen > tlen) ||
      (flen === tlen && f > tf) ||
      (f === tf && pos >= lit(target.pos))
  }
}
