package graft.store

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet, SQLException}

/** Statement plumbing shared by the embedded-Derby stores
  * ([[JdbcStreamStore]], [[DerbyHeadStore]]): prepared-statement
  * query/update wrappers, optional-int binding, existence-tolerant DDL,
  * and the Derby per-database shutdown dance. One definition, so a fix
  * (a new SQLState, statement caching) lands in every store at once. */
private[store] trait JdbcPlumbing {
  protected def conn: Connection

  protected final def query[T](sql: String)(bind: PreparedStatement => Unit)(read: ResultSet => T): IndexedSeq[T] = {
    val ps = conn.prepareStatement(sql)
    try {
      bind(ps)
      val rs = ps.executeQuery()
      try {
        val buf = Vector.newBuilder[T]
        while (rs.next()) buf += read(rs)
        buf.result()
      } finally rs.close()
    } finally ps.close()
  }

  protected final def update(sql: String)(bind: PreparedStatement => Unit): Unit = {
    updateCount(sql)(bind); ()
  }

  protected final def updateCount(sql: String)(bind: PreparedStatement => Unit): Int = {
    val ps = conn.prepareStatement(sql)
    try { bind(ps); ps.executeUpdate() } finally ps.close()
  }

  protected final def setOptInt(ps: PreparedStatement, idx: Int, v: Option[Int]): Unit =
    v match {
      case Some(x) => ps.setInt(idx, x)
      case None => ps.setNull(idx, java.sql.Types.INTEGER)
    }

  protected final def optInt(rs: ResultSet, idx: Int): Option[Int] = {
    val v = rs.getInt(idx); if (rs.wasNull()) None else Some(v)
  }

  /** Execute DDL, tolerating "already exists" (Derby SQLState X0Y32).
    * Returns true when this call created the object. */
  protected final def ddl(sql: String): Boolean = {
    val st = conn.createStatement()
    try { st.executeUpdate(sql); true }
    catch { case e: SQLException if e.getSQLState == "X0Y32" => false }
    finally st.close()
  }

  /** Shut down one embedded Derby database so its file locks release; a
    * SUCCESSFUL shutdown signals via SQLState 08006. */
  protected final def derbyShutdown(jdbcUrl: String): Unit =
    if (jdbcUrl.startsWith("jdbc:derby:"))
      try DriverManager.getConnection(jdbcUrl.takeWhile(_ != ';') + ";shutdown=true")
      catch { case e: SQLException if e.getSQLState == "08006" => () case _: SQLException => () }
}
