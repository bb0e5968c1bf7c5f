package graft.store

import java.sql.{Connection, PreparedStatement, ResultSet, SQLException}

/** Statement plumbing shared by the embedded-Derby stores
  * ([[JdbcStreamStore]], [[DerbyHeadStore]]): prepared-statement
  * query/update wrappers, optional-int binding, existence-tolerant DDL,
  * and the Derby per-database shutdown dance. One definition, so a fix
  * (a new SQLState, statement caching) lands in every store at once.
  *
  * Statements are CACHED per SQL text (LRU, [[JdbcPlumbing.StmtCacheCapacity]]
  * entries): Derby re-compiles on every `prepareStatement`, which made
  * each store call pay a plan-compilation tax — the round-5 bench showed
  * it as a constant factor on the append path. The store's own `synchronized`
  * discipline (every public operation holds the store lock; all query
  * results are materialized before the wrapper returns) makes one cached
  * statement per SQL text safe: a statement is never re-executed while a
  * previous use of it is still open.
  */
private[store] trait JdbcPlumbing {
  protected def conn: Connection

  /** Engine dialect: classifies "already exists" for [[ddl]] and owns
    * any embedded-shutdown behavior. Derby unless overridden. */
  protected def sqlDialect: SqlDialect = SqlDialect.Derby

  private val stmtCache =
    new java.util.LinkedHashMap[String, PreparedStatement](32, 0.75f, true) {
      override protected def removeEldestEntry(
          e: java.util.Map.Entry[String, PreparedStatement]): Boolean =
        if (size() > JdbcPlumbing.StmtCacheCapacity) {
          try e.getValue.close() catch { case _: SQLException => () }
          true
        } else false
    }

  /** A cached PreparedStatement for `sql` — prepared once per SQL text,
    * re-bound per call. Callers must NOT close it. */
  protected final def cachedStatement(sql: String): PreparedStatement = {
    val hit = stmtCache.get(sql)
    if (hit != null && !hit.isClosed) hit
    else {
      val ps = conn.prepareStatement(sql)
      stmtCache.put(sql, ps)
      ps
    }
  }

  /** Close every cached statement (before closing the connection). */
  protected final def closeCachedStatements(): Unit = {
    val it = stmtCache.values().iterator()
    while (it.hasNext) { try it.next().close() catch { case _: SQLException => () } }
    stmtCache.clear()
  }

  protected final def query[T](sql: String)(bind: PreparedStatement => Unit)(read: ResultSet => T): IndexedSeq[T] = {
    val ps = cachedStatement(sql)
    bind(ps)
    val rs = ps.executeQuery()
    try {
      val buf = Vector.newBuilder[T]
      while (rs.next()) buf += read(rs)
      buf.result()
    } finally rs.close()
  }

  protected final def update(sql: String)(bind: PreparedStatement => Unit): Unit = {
    updateCount(sql)(bind); ()
  }

  protected final def updateCount(sql: String)(bind: PreparedStatement => Unit): Int = {
    val ps = cachedStatement(sql)
    bind(ps)
    ps.executeUpdate()
  }

  protected final def setOptInt(ps: PreparedStatement, idx: Int, v: Option[Int]): Unit =
    v match {
      case Some(x) => ps.setInt(idx, x)
      case None => ps.setNull(idx, java.sql.Types.INTEGER)
    }

  protected final def optInt(rs: ResultSet, idx: Int): Option[Int] = {
    val v = rs.getInt(idx); if (rs.wasNull()) None else Some(v)
  }

  /** Execute DDL, tolerating "already exists" (as [[sqlDialect]]
    * classifies it). Returns true when this call created the object. */
  protected final def ddl(sql: String): Boolean = {
    val st = conn.createStatement()
    try { st.executeUpdate(sql); true }
    catch { case e: SQLException if sqlDialect.isAlreadyExists(e) => false }
    finally st.close()
  }

  /** Shut down one embedded database so its file locks release —
    * delegates to the dialect (no-op for client/server engines). */
  protected final def derbyShutdown(jdbcUrl: String): Unit =
    sqlDialect.shutdown(jdbcUrl)
}

private[store] object JdbcPlumbing {
  /** Distinct SQL texts kept prepared per store. The stores use a few
    * dozen fixed texts plus the power-of-two IN-list buckets; 64 covers
    * the working set without unbounded statement handles. */
  val StmtCacheCapacity = 64
}
