package graft.store

import graft.SparkTestSession
import graft.core._
import graft.streaming.Subscriptions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

import java.time.Instant
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** The JDBC-backed store run through the same contract as the parquet
  * store, mirroring the reference's per-backend acceptance wiring (the
  * shared acceptance suite runs over each `IStreamStore` fixture —
  * `tests/SqlStreamStore.AcceptanceTests/StreamStoreAcceptanceTests.cs`).
  * Backend here is embedded Derby, which ships with Spark. */
class JdbcStoreSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  private var dbDir: String = _
  private var clock: Clock.Manual = _
  private var store: JdbcStreamStore = _

  private def url(dir: String) = s"jdbc:derby:$dir/db;create=true"

  override def beforeEach(): Unit = {
    dbDir = SparkTestSession.tempDir("graft-jdbc")
    clock = new Clock.Manual(Instant.parse("2026-01-01T00:00:00Z"))
    store = new JdbcStreamStore(spark, url(dbDir), clock)
  }

  override def afterEach(): Unit = store.close()

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}""", """{"meta":1}"""))

  test("append creates stream; read returns messages in order") {
    val r = store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    assert(r === AppendResult(2, 2))
    val page = store.readStreamForwards("s1")
    assert(page.status === PageReadStatus.Success)
    assert(page.messages.map(_.streamVersion) === Seq(0, 1, 2))
    assert(page.messages.map(_.messageId) === Seq(mid(1), mid(2), mid(3)))
    assert(page.messages.head.jsonData === """{"data":1}""")
    assert(page.messages.head.jsonMetadata === """{"meta":1}""")
  }

  test("five-way expected-version semantics") {
    // NoStream on existing: full replay idempotent, extension throws
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
    assert(store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2)) === AppendResult(1, 1))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2, 3))
    }
    // exact version appends and idempotent replays
    assert(store.appendToStream("s1", 1, msgs(3)) === AppendResult(2, 2))
    assert(store.appendToStream("s1", 1, msgs(3)) === AppendResult(2, 2)) // replay at 1
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 1, msgs(4)) }
    intercept[WrongExpectedVersionException] { store.appendToStream("s1", 5, msgs(9)) }
    // Any: exact-suffix replay idempotent, partial overlap throws
    assert(store.appendToStream("s1", ExpectedVersion.Any, msgs(2, 3)) === AppendResult(2, 2))
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.Any, msgs(3, 4))
    }
    // EmptyStream on a non-empty stream throws
    intercept[WrongExpectedVersionException] {
      store.appendToStream("s1", ExpectedVersion.EmptyStream, msgs(7))
    }
  }

  test("empty-batch append creates an empty stream") {
    assert(store.appendToStream("e", ExpectedVersion.NoStream, Nil) === AppendResult(-1, -1))
    assert(store.readStreamHeadVersion("e") === -1)
    assert(store.readStreamForwards("e").status === PageReadStatus.Success)
    assert(store.listStreams().streamIds === Seq("e"))
  }

  test("read all forwards and backwards with paging") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1 to 10: _*))
    val p1 = store.readAllForwards(Position.Start, 4)
    assert(p1.messages.map(_.position) === Seq(0L, 1L, 2L, 3L))
    assert(!p1.isEnd)
    val p2 = p1.readNext()
    assert(p2.messages.map(_.position) === Seq(4L, 5L, 6L, 7L))
    val p3 = p2.readNext()
    assert(p3.messages.map(_.position) === Seq(8L, 9L))
    assert(p3.isEnd)
    val back = store.readAllBackwards(Position.End, 3)
    assert(back.messages.map(_.position) === Seq(9L, 8L, 7L))
    assert(back.readNext().messages.map(_.position) === Seq(6L, 5L, 4L))
  }

  test("read stream backwards from End and from a version") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3, 4))
    val b = store.readStreamBackwards("a")
    assert(b.messages.map(_.streamVersion) === Seq(3, 2, 1, 0))
    val from1 = store.readStreamBackwards("a", 1, 10)
    assert(from1.messages.map(_.streamVersion) === Seq(1, 0))
  }

  test("read nonexistent stream returns StreamNotFound") {
    assert(store.readStreamForwards("nope").status === PageReadStatus.StreamNotFound)
    assert(store.readStreamBackwards("nope").status === PageReadStatus.StreamNotFound)
  }

  test("head positions") {
    assert(store.readHeadPosition() === -1L)
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    assert(store.readHeadPosition() === 1L)
    assert(store.readStreamHeadVersion("a") === 1)
    assert(store.readStreamHeadPosition("a") === 1L)
    assert(store.readStreamHeadVersion("nope") === -1)
  }

  test("delete stream with expected-version semantics and $deleted tracking") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    intercept[WrongExpectedVersionException] { store.deleteStream("a", 0) }
    store.deleteStream("a", 1)
    assert(store.readStreamForwards("a").status === PageReadStatus.StreamNotFound)
    val tracked = store.readStreamForwards(Deleted.DeletedStreamId)
    assert(tracked.messages.map(_.`type`) === Seq(Deleted.StreamDeletedMessageType))
    // deleting a nonexistent stream: no-op unless a concrete version is expected
    store.deleteStream("ghost")
    intercept[WrongExpectedVersionException] { store.deleteStream("ghost", 3) }
  }

  test("delete message removes a single row and tracks it") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
    store.deleteMessage("a", mid(2))
    assert(store.readStreamForwards("a").messages.map(_.messageId) === Seq(mid(1), mid(3)))
    // head does not regress when the newest message is deleted
    store.deleteMessage("a", mid(3))
    assert(store.readStreamHeadVersion("a") === 2)
    assert(store.readStreamHeadPosition("a") === 2L)
    val types = store.readStreamForwards(Deleted.DeletedStreamId).messages.map(_.`type`)
    assert(types === Seq(Deleted.MessageDeletedMessageType, Deleted.MessageDeletedMessageType))
    store.deleteMessage("a", mid(9)) // unknown id: no-op
    assert(store.readStreamForwards("a").messages.map(_.messageId) === Seq(mid(1)))
  }

  test("metadata round-trips, applies retention, and inherits on create") {
    store.setStreamMetadata("a", maxAge = Some(60), maxCount = Some(2),
      metadataJson = Some("""{"k":"v"}"""))
    val m = store.getStreamMetadata("a")
    assert(m.metadataStreamVersion === 0)
    assert(m.maxAge === Some(60) && m.maxCount === Some(2))
    assert(m.metadataJson === """{"k":"v"}""")
    // stream created AFTER metadata inherits maxCount: keeps newest 2
    store.appendToStream("a", ExpectedVersion.Any, msgs(1, 2, 3, 4))
    assert(store.readStreamForwards("a").messages.map(_.streamVersion) === Seq(2, 3))
  }

  test("shrinking maxCount re-scavenges an existing stream") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3, 4, 5))
    store.setStreamMetadata("a", maxCount = Some(2))
    assert(store.readStreamForwards("a").messages.map(_.streamVersion) === Seq(3, 4))
  }

  test("maxAge expires messages from reads and purges them") {
    store.setStreamMetadata("a", maxAge = Some(100))
    store.appendToStream("a", ExpectedVersion.Any, msgs(1, 2))
    clock.advanceSeconds(50)
    store.appendToStream("a", ExpectedVersion.Any, msgs(3))
    clock.advanceSeconds(60) // first two now older than 100s
    assert(store.readStreamForwards("a").messages.map(_.messageId) === Seq(mid(3)))
    assert(store.readAllForwards().messages.filter(_.streamId == "a").map(_.messageId) === Seq(mid(3)))
    // purge tracked the deletions
    val tracked = store.readStreamForwards(Deleted.DeletedStreamId).messages.map(_.`type`)
    assert(tracked.count(_ == Deleted.MessageDeletedMessageType) === 2)
  }

  test("list streams with patterns and keyset pagination") {
    Seq("order-1", "order-2", "invoice-1").foreach(id =>
      store.appendToStream(id, ExpectedVersion.NoStream, msgs(1)))
    assert(store.listStreams().streamIds === Seq("order-1", "order-2", "invoice-1"))
    assert(store.listStreams(Pattern.StartsWith("order-")).streamIds === Seq("order-1", "order-2"))
    assert(store.listStreams(Pattern.EndsWith("-1")).streamIds === Seq("order-1", "invoice-1"))
    val p1 = store.listStreams(Pattern.Anything, maxCount = 2)
    assert(p1.streamIds.size === 2)
    assert(p1.readNext().streamIds === Seq("invoice-1"))
    store.deleteStream("order-2")
    assert(store.listStreams(Pattern.StartsWith("order-")).streamIds === Seq("order-1"))
  }

  test("prefetch=false omits payload; lazy lookup fetches; None after delete") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1))
    val page = store.readStreamForwards("a", 0, 10, prefetch = false)
    assert(page.messages.head.jsonData === null)
    assert(store.readMessageData("a", 0) === Some("""{"data":1}"""))
    store.deleteStream("a")
    assert(store.readMessageData("a", 0) === None)
  }

  test("reopen recovers heads, positions, and retention from the database") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    store.setStreamMetadata("a", maxCount = Some(10))
    store.appendToStream("b", ExpectedVersion.NoStream, msgs(3))
    store.close()
    store = new JdbcStreamStore(spark, url(dbDir), clock)
    assert(store.readHeadPosition() === 3L) // metadata message took position 2
    assert(store.readStreamHeadVersion("a") === 1)
    assert(store.readStreamForwards("a").messages.map(_.messageId) === Seq(mid(1), mid(2)))
    assert(store.getStreamMetadata("a").maxCount === Some(10))
    // appends continue with dense positions after reopen
    assert(store.appendToStream("b", 0, msgs(4)) === AppendResult(1, 4))
  }

  test("position counter does not regress after deleting the newest rows") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
    store.deleteStream("a", 1)
    store.close()
    store = new JdbcStreamStore(spark, url(dbDir), clock)
    // positions 0-1 deleted, but the allocator moved past the tracking row
    val r = store.appendToStream("b", ExpectedVersion.NoStream, msgs(3))
    assert(r.currentPosition > 1L)
  }

  test("allMessages exposes the log as a position-partitioned DataFrame") {
    store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
    store.appendToStream("b", ExpectedVersion.NoStream, msgs(4))
    val df = store.allMessages(numPartitions = 2)
    assert(df.columns.toSeq === Seq("streamId", "messageId", "streamVersion", "position",
      "createdUtc", "type", "jsonData", "jsonMetadata"))
    val rows = df.orderBy("position").collect()
    assert(rows.map(_.getLong(3)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "a", "a", "b"))
    assert(rows.head.getString(6) === """{"data":1}""")
    // filter pushes into the JDBC scan (position range predicate)
    assert(df.filter("position >= 2").count() === 2)
    // empty store yields an empty frame with the same schema
    val empty = new JdbcStreamStore(spark, url(SparkTestSession.tempDir("graft-jdbc-e")), clock)
    try assert(empty.allMessages().count() === 0)
    finally empty.close()
  }

  test("subscriptions run unchanged over the JDBC store (trait parity)") {
    store.appendToStream("s", ExpectedVersion.NoStream, msgs(1, 2, 3))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val caught = new CountDownLatch(1)
    val gotNew = new CountDownLatch(4)
    val sub = Subscriptions.subscribeToAll(store, None,
      m => { seen.add(m.position); gotNew.countDown() },
      b => if (b) caught.countDown())
    try {
      assert(caught.await(30, TimeUnit.SECONDS))
      store.appendToStream("s", ExpectedVersion.Any, msgs(4))
      assert(gotNew.await(30, TimeUnit.SECONDS))
      assert(seen.toArray.toSeq === Seq(0L, 1L, 2L, 3L))
    } finally sub.close()
  }

  test("long stream ids work via the fixed-width hashed primary key") {
    // ref shape: id = hash of id_original, so id length never overflows
    // the PK index (PostgresqlStreamId.cs:14-27)
    val longId = "long-" + ("x" * 600)
    store.appendToStream(longId, ExpectedVersion.NoStream, msgs(1, 2))
    assert(store.readStreamForwards(longId).messages.size === 2)
    assert(store.listStreams(Pattern.StartsWith("long-")).streamIds === Seq(longId))
    assert(store.readMessageData(longId, 0) === Some("""{"data":1}"""))
    store.deleteStream(longId)
    assert(store.readStreamForwards(longId).status === PageReadStatus.StreamNotFound)
  }

  test("checkSchema stamps the version at creation and never restamps on reopen") {
    assert(store.checkSchema() ===
      JdbcStreamStore.CheckSchemaResult(JdbcStreamStore.CurrentSchemaVersion, JdbcStreamStore.CurrentSchemaVersion))
    assert(store.checkSchema().isMatch)
    store.appendToStream("s1", ExpectedVersion.NoStream, msgs(1))
    store.close()

    // simulate an older database: rewrite the stamped version out-of-band
    val raw = java.sql.DriverManager.getConnection(url(dbDir))
    try {
      val st = raw.createStatement()
      try st.executeUpdate("UPDATE graft_counters SET v=0 WHERE k='schema_version'")
      finally st.close()
    } finally raw.close()

    store = new JdbcStreamStore(spark, url(dbDir), clock)
    val r = store.checkSchema()
    assert(r === JdbcStreamStore.CheckSchemaResult(0, JdbcStreamStore.CurrentSchemaVersion))
    assert(!r.isMatch, "reopen must report, not silently restamp, an old schema")

    // migrate() is the defined way forward: the 0→1 ladder step stamps a
    // pre-versioning database (identical object set) and data survives
    // (ref: MigrateProgress.cs, PostgresStreamStore.Migration.cs)
    assert(store.migrate() === JdbcStreamStore.CurrentSchemaVersion)
    assert(store.checkSchema().isMatch)
    assert(store.readStreamForwards("s1").messages.size === 1)
  }

  test("migrate completes a partially-created schema and refuses downgrades") {
    // simulate a crash mid-creation: only the first DDL object exists
    val dir = SparkTestSession.tempDir("graft-partial")
    val raw = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")
    try {
      val first = JdbcStreamStore.schemaCreationScript.split(";").map(_.trim).filter(_.nonEmpty).head
      val st = raw.createStatement(); try st.executeUpdate(first) finally st.close()
    } finally raw.close()

    // open completes the missing objects but must NOT stamp (partial ≠ fresh)
    val partial = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try {
      assert(partial.checkSchema().currentVersion === 0,
        "a partially-created schema must not be silently stamped current")
      assert(partial.migrate() === JdbcStreamStore.CurrentSchemaVersion)
      assert(partial.checkSchema().isMatch)
      partial.appendToStream("s1", ExpectedVersion.NoStream, msgs(1))
      assert(partial.readStreamForwards("s1").messages.size === 1)
    } finally partial.close()

    // a database stamped newer than this code refuses to migrate down
    val raw2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db")
    try {
      val st = raw2.createStatement()
      try st.executeUpdate(
        s"UPDATE graft_counters SET v=${JdbcStreamStore.CurrentSchemaVersion + 1} WHERE k='schema_version'")
      finally st.close()
    } finally raw2.close()
    val newer = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try intercept[IllegalArgumentException](newer.migrate())
    finally newer.close()
  }

  test("migrate upgrades a real v1 database to v2: backfill + suffix listing") {
    // Build a genuine v1 database with raw JDBC — the schema an older
    // deployment left behind: v1 object set (no id_original_reversed),
    // data in place, version stamped 1.
    val dir = SparkTestSession.tempDir("graft-v1db")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def dbId(s: String) =
      sha.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val raw = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")
    try {
      val st = raw.createStatement()
      try {
        JdbcStreamStore.creationDdlV1(SqlDialect.Derby).foreach(st.executeUpdate)
        Seq("orders-42" -> 0L, "audit-42" -> 1L).foreach { case (id, internal) =>
          st.executeUpdate(
            s"INSERT INTO graft_streams (id, id_original, id_internal, version, position, max_age, max_count) " +
              s"VALUES ('${dbId(id)}', '$id', $internal, 1, ${internal * 2 + 1}, NULL, NULL)")
          (0 to 1).foreach { v =>
            st.executeUpdate(
              s"INSERT INTO graft_messages (position, stream_id_internal, stream_version, message_id, created_micros, msg_type, json_data, json_metadata) " +
                s"VALUES (${internal * 2 + v}, $internal, $v, '${mid((internal * 2 + v).toInt + 1)}', 0, 't', '{}', NULL)")
          }
        }
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_position', 4)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_id_internal', 2)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('schema_version', 1)")
      } finally st.close()
    } finally raw.close()

    // New code opens it: reports v1 vs v2, does NOT silently touch it
    val s2 = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try {
      assert(s2.checkSchema() ===
        JdbcStreamStore.CheckSchemaResult(1, JdbcStreamStore.CurrentSchemaVersion))

      // the ladder: 1→2 adds the column, BACKFILLS it, builds the index
      assert(s2.migrate() === JdbcStreamStore.CurrentSchemaVersion)
      assert(s2.checkSchema().isMatch)

      // backfill moved real data: reversed ids are queryable and indexed
      assert(s2.listStreams(Pattern.EndsWith("-42")).streamIds.sorted ===
        Seq("audit-42", "orders-42"))
      // pre-migration data still reads
      assert(s2.readStreamForwards("orders-42").messages.map(_.streamVersion) === Seq(0, 1))
      assert(s2.readAllForwards(Position.Start).messages.size === 4)
      // post-migration writes land with the v2 column populated
      s2.appendToStream("fresh-42", ExpectedVersion.NoStream, msgs(9))
      assert(s2.listStreams(Pattern.EndsWith("-42")).streamIds.size === 3)
    } finally s2.close()

    // and the backfilled value really sits in the column (not recomputed)
    val check = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db")
    try {
      val st = check.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT id_original_reversed FROM graft_streams WHERE id_original='orders-42'")
        assert(rs.next() && rs.getString(1) === "24-sredro")
      } finally st.close()
    } finally check.close()
  }

  test("migrate upgrades the LEGACY layout (no stream position): add + backfill") {
    // The reference's pre-0.8.0 schema (ScriptsV2/CreateSchema_v1.sql)
    // has no Streams.Position; its Migration_v2.sql adds the column at
    // -1 and backfills each stream from MAX(Messages.Position). Build
    // that exact shape raw, then climb the whole ladder.
    val dir = SparkTestSession.tempDir("graft-legacydb")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def dbId(s: String) =
      sha.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val raw = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")
    try {
      val st = raw.createStatement()
      try {
        JdbcStreamStore.creationDdlLegacy(SqlDialect.Derby).foreach(st.executeUpdate)
        // two streams with messages at positions {0,1} and {2,3}; one
        // stream with NO messages (must backfill to -1)
        Seq("orders-7" -> 0L, "audit-7" -> 1L).foreach { case (id, internal) =>
          st.executeUpdate(
            s"INSERT INTO graft_streams (id, id_original, id_internal, version, max_age, max_count) " +
              s"VALUES ('${dbId(id)}', '$id', $internal, 1, NULL, NULL)")
          (0 to 1).foreach { v =>
            st.executeUpdate(
              s"INSERT INTO graft_messages (position, stream_id_internal, stream_version, message_id, created_micros, msg_type, json_data, json_metadata) " +
                s"VALUES (${internal * 2 + v}, $internal, $v, '${mid((internal * 2 + v).toInt + 1)}', 0, 't', '{}', NULL)")
          }
        }
        st.executeUpdate(
          s"INSERT INTO graft_streams (id, id_original, id_internal, version, max_age, max_count) " +
            s"VALUES ('${dbId("empty-7")}', 'empty-7', 2, -1, NULL, NULL)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_position', 4)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_id_internal', 3)")
        // no schema_version row: the oldest deployments predate stamping
      } finally st.close()
    } finally raw.close()

    val s2 = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try {
      assert(s2.checkSchema().currentVersion === 0)
      assert(s2.migrate() === JdbcStreamStore.CurrentSchemaVersion)
      assert(s2.checkSchema().isMatch)
      // the backfill: per-stream max message position; -1 where empty
      assert(s2.readStreamHeadPosition("orders-7") === 1L)
      assert(s2.readStreamHeadPosition("audit-7") === 3L)
      // pre-migration data reads; post-migration writes work end to end
      assert(s2.readAllForwards(Position.Start).messages.size === 4)
      val ar = s2.appendToStream("orders-7", 1, msgs(9))
      assert(ar.currentPosition === 4L)
      assert(s2.readStreamForwards("orders-7").messages.map(_.streamVersion) ===
        Seq(0, 1, 2))
      assert(s2.listStreams(Pattern.EndsWith("-7")).streamIds.sorted ===
        Seq("audit-7", "empty-7", "orders-7"))
    } finally s2.close()

    // the backfilled position really sits in the column
    val check = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db")
    try {
      val st = check.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT id_original, position FROM graft_streams ORDER BY id_internal")
        val got = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2))).toSeq
        // audit-7/empty-7 prove the BACKFILL (untouched since); orders-7
        // at 4 proves post-migration appends maintain the column
        assert(got === Seq(("orders-7", 4L), ("audit-7", 3L), ("empty-7", -1L)))
      } finally st.close()
    } finally check.close()
  }

  test("migrate folds a multi-rung ladder: v1 → v3 in one call, data intact at each hop") {
    // The reference ships an operational 2-hop upgrade (MsSql V2→V3
    // mover); this pins that OUR ladder is a fold over ordered rungs,
    // not a hardwired pair — a synthetic v2→v3 rung (one annotation
    // column) is appended and a genuine v1 database climbs both hops in
    // one migrateTo() call, with the v2 backfill AND the v3 column both
    // landing and all pre-migration data readable.
    val dir = SparkTestSession.tempDir("graft-v1db-2hop")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def dbId(s: String) =
      sha.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val raw = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")
    try {
      val st = raw.createStatement()
      try {
        JdbcStreamStore.creationDdlV1(SqlDialect.Derby).foreach(st.executeUpdate)
        Seq("orders-7" -> 0L, "audit-7" -> 1L).foreach { case (id, internal) =>
          st.executeUpdate(
            s"INSERT INTO graft_streams (id, id_original, id_internal, version, position, max_age, max_count) " +
              s"VALUES ('${dbId(id)}', '$id', $internal, 1, ${internal * 2 + 1}, NULL, NULL)")
          (0 to 1).foreach { v =>
            st.executeUpdate(
              s"INSERT INTO graft_messages (position, stream_id_internal, stream_version, message_id, created_micros, msg_type, json_data, json_metadata) " +
                s"VALUES (${internal * 2 + v}, $internal, $v, '${mid((internal * 2 + v).toInt + 1)}', 0, 't', '{}', NULL)")
          }
        }
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_position', 4)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('next_id_internal', 2)")
        st.executeUpdate("INSERT INTO graft_counters (k, v) VALUES ('schema_version', 1)")
      } finally st.close()
    } finally raw.close()

    val ladderV3 = JdbcStreamStore.migrationLadder :+
      JdbcStreamStore.MigrationStep(2, "test-only v3: annotation column",
        _.migrationDdl("ALTER TABLE graft_streams ADD COLUMN note VARCHAR(16)"))
    val s2 = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try {
      assert(s2.checkSchema().currentVersion === 1)
      assert(s2.migrateTo(3, ladderV3) === 3)
      // both hops landed: the v2 backfill answers suffix listing...
      assert(s2.listStreams(Pattern.EndsWith("-7")).streamIds.sorted ===
        Seq("audit-7", "orders-7"))
      // ...and pre-migration data still reads after 2 hops
      assert(s2.readStreamForwards("orders-7").messages.map(_.streamVersion) === Seq(0, 1))
      assert(s2.readAllForwards(Position.Start).messages.size === 4)
      // a fold past the ladder's edge still fails loudly
      val e = intercept[IllegalStateException](s2.migrateTo(4, ladderV3))
      assert(e.getMessage.contains("no migration defined from schema version 3"))
    } finally s2.close()

    // the v3 column physically exists and the stamp reads 3 on reopen
    val check = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db")
    try {
      val st = check.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT note FROM graft_streams WHERE id_original='orders-7'")
        assert(rs.next() && rs.getString(1) == null)
        val vs = st.executeQuery(
          "SELECT v FROM graft_counters WHERE k='schema_version'")
        assert(vs.next() && vs.getLong(1) === 3L)
      } finally st.close()
    } finally check.close()
  }

  test("per-append cost is flat in stream length (no O(stream) idempotency scan)") {
    // Grow one stream to 50k messages, measuring the median single-append
    // latency at ~1k and again at ~50k. The idempotency checks must be
    // O(batch) index probes, so the two medians stay comparable; the old
    // full-stream replay made every append at 50k a 50k-row scan.
    var next = 0
    def batch(n: Int): Seq[NewStreamMessage] = {
      val b = (next until next + n).map(i =>
        NewStreamMessage(mid(i), "t", s"""{"i":$i}"""))
      next += n
      b
    }
    def grow(target: Int): Unit =
      while (next < target) store.appendToStream("big", ExpectedVersion.Any, batch(2000))
    def medianAppendMs(n: Int): Double = {
      val times = (0 until n).map { _ =>
        val b = batch(1)
        val t0 = System.nanoTime()
        store.appendToStream("big", ExpectedVersion.Any, b)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      times(n / 2)
    }
    grow(1000)
    val early = medianAppendMs(60)
    grow(50000)
    val late = medianAppendMs(60)
    assert(store.readStreamHeadVersion("big") === next - 1)
    // generous: pre-fix this ratio is ~50x (scan grows 50x), post-fix ~1x
    assert(late < early * 10 + 1.0,
      s"append latency grew with stream length: ${early}ms at 1k vs ${late}ms at 50k")
    // idempotent replay of an interior run is still detected at 50k
    val r = store.appendToStream("big", ExpectedVersion.Any,
      (25000 until 25003).map(i => NewStreamMessage(mid(i), "t", s"""{"i":$i}""")))
    assert(r.currentVersion === next - 1)
    // and partial overlap still conflicts
    intercept[WrongExpectedVersionException] {
      store.appendToStream("big", ExpectedVersion.Any,
        Seq(NewStreamMessage(mid(30000), "t", "{}"), NewStreamMessage(mid(next + 5), "t", "{}")))
    }
  }

  test("schemaCreationScript is the DDL the store executes, runnable standalone") {
    // ref: SchemaCreationScriptTool — the script must stand on its own so
    // a DBA can create the schema ahead of deployment
    val script = JdbcStreamStore.schemaCreationScript
    assert(script === store.schemaCreationScript)
    Seq("graft_streams", "graft_messages", "graft_counters").foreach { t =>
      assert(script.contains(s"CREATE TABLE $t"), s"script must create $t")
    }
    val dir = SparkTestSession.tempDir("graft-ddl")
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")
    try {
      script.split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
        val st = conn.createStatement(); try st.executeUpdate(stmt) finally st.close()
      }
    } finally conn.close()
    // a store opening over the pre-created schema works and reports it
    // as pre-versioning (version 0: the stamp is written only when the
    // STORE creates the schema)
    val pre = new JdbcStreamStore(spark, s"jdbc:derby:$dir/db", clock)
    try {
      assert(pre.checkSchema().currentVersion === 0)
      pre.appendToStream("s1", ExpectedVersion.NoStream, msgs(1))
      assert(pre.readStreamForwards("s1").messages.size === 1)
    } finally pre.close()
  }

  test("in-memory database URL gives the reference's InMemoryStreamStore parity") {
    // ref: src/SqlStreamStore/InMemory/InMemoryStreamStore.cs — an
    // ephemeral, zero-file backend; here Derby's memory: subprotocol
    // behind the same JdbcStreamStore contract
    val mem = new JdbcStreamStore(spark, "jdbc:derby:memory:graft-mem;create=true", clock)
    try {
      val r = mem.appendToStream("s1", ExpectedVersion.NoStream, msgs(1, 2))
      assert(r === AppendResult(1, 1))
      assert(mem.readStreamForwards("s1").messages.map(_.messageId) === Seq(mid(1), mid(2)))
      assert(mem.readAllForwards(Position.Start, 10).messages.size === 2)
      assert(mem.allMessages().count() === 2L)
      intercept[WrongExpectedVersionException] {
        mem.appendToStream("s1", 5, msgs(9))
      }
    } finally mem.close()
    // ephemeral: a NEW in-memory database under the same name is empty
    val fresh = new JdbcStreamStore(spark, "jdbc:derby:memory:graft-mem2;create=true", clock)
    try assert(fresh.readHeadPosition() === Position.End)
    finally fresh.close()
  }

  test("a batch with duplicate message ids is rejected before touching the database") {
    intercept[IllegalArgumentException] {
      store.appendToStream("s1", ExpectedVersion.Any, msgs(1) ++ msgs(1))
    }
    assert(store.readStreamForwards("s1").status === PageReadStatus.StreamNotFound)
  }

  test("system stream ids are rejected at the write surface") {
    intercept[IllegalArgumentException] {
      store.appendToStream("$sys", ExpectedVersion.Any, msgs(1))
    }
    intercept[IllegalArgumentException] { store.deleteStream("$sys") }
    intercept[IllegalArgumentException] { store.setStreamMetadata("$sys", maxAge = Some(1)) }
  }
}
