package graft.store

import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.SQLException
import java.time.Instant

/** The dialect seam ([[SqlDialect]]): URL resolution, the per-engine SQL
  * forms, and the store running through an EXPLICITLY injected dialect.
  * Only Derby ships in this zero-egress image, so Derby carries the full
  * acceptance matrix (every Jdbc*Spec runs through the seam now) while
  * Postgres/MySQL are pinned at the SQL-text level — the four divergence
  * points in [[SqlDialect]]'s doc are the store's entire engine-variant
  * surface, so these texts plus the shared-suite run on Derby cover the
  * portability claim as far as an offline image can. */
class SqlDialectSpec extends AnyFunSuite {

  private def sqlEx(state: String) = new SQLException("x", state)

  test("forUrl resolves engines by URL prefix") {
    assert(SqlDialect.forUrl("jdbc:derby:/tmp/db;create=true") eq SqlDialect.Derby)
    assert(SqlDialect.forUrl("jdbc:postgresql://h/db") eq SqlDialect.Postgres)
    assert(SqlDialect.forUrl("jdbc:mysql://h/db") eq SqlDialect.MySql)
    assert(SqlDialect.forUrl("jdbc:mariadb://h/db") eq SqlDialect.MySql)
    assert(SqlDialect.forUrl("jdbc:sqlite:/tmp/db.sqlite") eq SqlDialect.Sqlite)
    assert(SqlDialect.forUrl("jdbc:sqlserver://h;databaseName=db") eq SqlDialect.MsSql)
    assert(SqlDialect.forUrl("jdbc:jtds:sqlserver://h/db") eq SqlDialect.MsSql)
    assert(SqlDialect.forUrl("jdbc:h2:mem:x") eq SqlDialect.Ansi)
  }

  test("limit clauses per engine") {
    assert(SqlDialect.Derby.limitClause(10) === "FETCH FIRST 10 ROWS ONLY")
    assert(SqlDialect.Postgres.limitClause(10) === "LIMIT 10")
    assert(SqlDialect.MySql.limitClause(10) === "LIMIT 10")
    assert(SqlDialect.Sqlite.limitClause(10) === "LIMIT 10")
    // MsSql: the seam is a suffix after ORDER BY, so the ANSI
    // OFFSET/FETCH form stands in for the reference's prefix TOP(n) —
    // same 2012+ floor as ScriptsV3/CreateSchema.sql:1, same rows
    assert(SqlDialect.MsSql.limitClause(10) ===
      "OFFSET 0 ROWS FETCH NEXT 10 ROWS ONLY")
    assert(SqlDialect.Ansi.limitClause(10) === "FETCH FIRST 10 ROWS ONLY")
  }

  test("text types and typed NULLs per engine") {
    assert(SqlDialect.Derby.textType === "CLOB")
    assert(SqlDialect.Derby.nullText === "CAST(NULL AS CLOB)")
    assert(SqlDialect.Postgres.textType === "TEXT")
    assert(SqlDialect.Postgres.nullText === "CAST(NULL AS TEXT)")
    assert(SqlDialect.MySql.textType === "LONGTEXT")
    assert(SqlDialect.Sqlite.textType === "TEXT")
    assert(SqlDialect.Sqlite.nullText === "CAST(NULL AS TEXT)")
    assert(SqlDialect.MsSql.textType === "NVARCHAR(max)")
    assert(SqlDialect.MsSql.nullText === "CAST(NULL AS NVARCHAR(max))")
  }

  test("already-exists classification per engine") {
    assert(SqlDialect.Derby.isAlreadyExists(sqlEx("X0Y32")))
    assert(!SqlDialect.Derby.isAlreadyExists(sqlEx("42X05")))
    assert(SqlDialect.Postgres.isAlreadyExists(sqlEx("42P07")))
    assert(SqlDialect.Postgres.isAlreadyExists(sqlEx("42710")))
    assert(!SqlDialect.Postgres.isAlreadyExists(sqlEx("X0Y32")))
    assert(SqlDialect.MySql.isAlreadyExists(sqlEx("42S01")))
    // Sqlite JDBC drivers ship no SQLState — classification is by
    // message text (the reference sidesteps this with CREATE TABLE IF
    // NOT EXISTS, Scripts/Tables.sql:1)
    assert(SqlDialect.Sqlite.isAlreadyExists(
      new SQLException("[SQLITE_ERROR] SQL error or missing database (table graft_streams already exists)")))
    assert(!SqlDialect.Sqlite.isAlreadyExists(new SQLException("no such table: x")))
    assert(!SqlDialect.Sqlite.isAlreadyExists(new SQLException(null: String)))
    // MsSql surfaces already-exists as server error NUMBERS under the
    // generic S0001 SQLState: 2714 for objects, 1913 for indexes — the
    // reference's IF OBJECT_ID guards (CreateSchema.sql:9,27) sidestep
    // classification; existence-tolerant creation re-derives it
    assert(SqlDialect.MsSql.isAlreadyExists(
      new SQLException("There is already an object named 'graft_streams' in the database.", "S0001", 2714)))
    assert(SqlDialect.MsSql.isAlreadyExists(
      new SQLException("The operation failed because an index or statistics with name 'x' already exists", "S0001", 1913)))
    assert(!SqlDialect.MsSql.isAlreadyExists(
      new SQLException("Invalid object name 'y'.", "S0002", 208)))
  }

  test("creation DDL carries the dialect's text type") {
    val derby = JdbcStreamStore.schemaCreationScript(SqlDialect.Derby)
    val pg = JdbcStreamStore.schemaCreationScript(SqlDialect.Postgres)
    val my = JdbcStreamStore.schemaCreationScript(SqlDialect.MySql)
    val sqlite = JdbcStreamStore.schemaCreationScript(SqlDialect.Sqlite)
    val ms = JdbcStreamStore.schemaCreationScript(SqlDialect.MsSql)
    assert(derby.contains("json_data CLOB"))
    assert(pg.contains("json_data TEXT"))
    assert(!pg.contains("CLOB"))
    assert(my.contains("json_data LONGTEXT"))
    assert(sqlite.contains("json_data TEXT"))
    assert(!sqlite.contains("CLOB"))
    assert(ms.contains("json_data NVARCHAR(max)")) // CreateSchema.sql:59
    assert(!ms.contains("CLOB"))
    // v2 objects present in every dialect's creation script — for MsSql
    // the materialized reversed column mirrors V3's computed
    // IdOriginalReversed (CreateSchema.sql:19)
    Seq(derby, pg, my, sqlite, ms).foreach { s =>
      assert(s.contains("id_original_reversed"))
      assert(s.contains("graft_streams_rev"))
    }
  }

  test("legacy pre-0.8.0 rung: add+backfill text pinned per dialect (pure ANSI, no engine-variant token)") {
    val dialects = Seq(SqlDialect.Derby, SqlDialect.Postgres,
      SqlDialect.MySql, SqlDialect.Sqlite, SqlDialect.MsSql, SqlDialect.Ansi)
    dialects.foreach { d =>
      val Seq(alter, backfill) = JdbcStreamStore.legacyPositionMigration(d)
      // the Derby-acceptance-tested text IS the text every engine gets
      assert(alter ===
        "ALTER TABLE graft_streams ADD COLUMN position BIGINT DEFAULT -1 NOT NULL",
        s"alter text diverged for ${d.name}")
      assert(backfill.startsWith("UPDATE graft_streams SET position ="))
      assert(backfill.contains(
        "COALESCE((SELECT MAX(m.position) FROM graft_messages m"))
      assert(backfill.contains(
        "WHERE m.stream_id_internal = graft_streams.id_internal), -1)"))
      // the invariance claim, asserted: no dialect-varying construct may
      // leak into the rung (those are the ONLY four divergence points)
      Seq("FETCH FIRST", "LIMIT ", "CLOB", "LONGTEXT", "NVARCHAR",
          "OFFSET 0 ROWS").foreach { tok =>
        assert(!alter.contains(tok) && !backfill.contains(tok),
          s"engine-variant token '$tok' in the ${d.name} legacy rung")
      }
    }
    // v0 DETECTION shape: the legacy creation DDL differs from v1 by
    // exactly the missing per-stream position column, in every dialect —
    // so columnExists(position) is a sound v0 discriminator everywhere
    dialects.foreach { d =>
      val v1 = JdbcStreamStore.creationDdlV1(d).mkString("\n---\n")
      val legacy = JdbcStreamStore.creationDdlLegacy(d).mkString("\n---\n")
      assert(v1.contains("  position BIGINT NOT NULL,"))
      assert(!legacy.contains("  position BIGINT NOT NULL,"))
      assert(v1.replace("  position BIGINT NOT NULL,\n", "") === legacy,
        s"legacy DDL for ${d.name} diverges from v1 beyond the position column")
    }
  }

  test("store runs end-to-end through an explicitly injected dialect") {
    val dir = SparkTestSession.tempDir("graft-dialect")
    val store = new JdbcStreamStore(SparkTestSession.spark, s"jdbc:derby:$dir/db;create=true",
      new Clock.Manual(Instant.parse("2026-01-01T00:00:00Z")),
      trackDeletes = true, dialect = Some(SqlDialect.Derby))
    try {
      store.appendToStream("a-stream", ExpectedVersion.NoStream,
        Seq(NewStreamMessage("00000000-0000-0000-0000-000000000001", "t", "{}")))
      assert(store.readStreamForwards("a-stream").messages.size === 1)
      assert(store.listStreams(Pattern.EndsWith("stream")).streamIds === Seq("a-stream"))
    } finally store.close()
  }
}
