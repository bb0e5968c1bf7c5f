package graft.store

import graft.SparkTestSession
import graft.core.Clock

/** Backend factories so the behavior suites run over both stores, the
  * way the reference's shared acceptance suite runs over each
  * `IStreamStore` fixture (`StreamStoreAcceptanceTests.cs`). */
trait ParquetBackend {
  protected def makeStore(name: String, trackDeletes: Boolean = true,
      clock: Clock = Clock.System): StreamStore =
    new SparkStreamStore(SparkTestSession.spark, SparkTestSession.tempDir(name),
      clock, trackDeletes = trackDeletes)
}

trait DerbyBackend {
  protected def makeStore(name: String, trackDeletes: Boolean = true,
      clock: Clock = Clock.System): StreamStore = {
    val dir = SparkTestSession.tempDir(name)
    new JdbcStreamStore(SparkTestSession.spark,
      s"jdbc:derby:$dir/db;create=true", clock, trackDeletes)
  }
}

/** Through-the-wire backend: HTTP server over a parquet store, driven by
  * the [[graft.http.HttpStreamStore]] client (the reference's HttpTests
  * fixture). Closing the client tears down the server + backing store. */
trait HttpBackend {
  protected def makeStore(name: String, trackDeletes: Boolean = true,
      clock: Clock = Clock.System): StreamStore = {
    val backing = new SparkStreamStore(SparkTestSession.spark,
      SparkTestSession.tempDir(name), clock, trackDeletes = trackDeletes)
    val server = new graft.http.StreamStoreHttpServer(backing)
    new graft.http.HttpStreamStore(server.baseUrl,
      onClose = () => { server.close(); backing.close() })
  }
}
