package graft.tools

import graft.core._
import graft.store.SparkStreamStore
import graft.streaming.Subscriptions
import org.apache.spark.sql.SparkSession

/** End-to-end walkthrough of the public API against a scratch directory —
  * the library's "hello world". Run: `sbt "runMain graft.tools.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val store = new SparkStreamStore(spark, dir)

    def mid(n: Int) = f"00000000-0000-0000-0000-$n%012d"

    println("== append ==")
    val r1 = store.appendToStream("account-1", ExpectedVersion.NoStream, Seq(
      NewStreamMessage(mid(1), "opened", """{"balance":0}"""),
      NewStreamMessage(mid(2), "credited", """{"amount":100}""")))
    println(s"account-1 head after append: $r1")
    val r2 = store.appendToStream("account-2", ExpectedVersion.NoStream, Seq(
      NewStreamMessage(mid(3), "opened", """{"balance":10}""")))
    println(s"account-2 head after append: $r2")

    println("== idempotent replay (same batch, NoStream) ==")
    val r3 = store.appendToStream("account-1", ExpectedVersion.NoStream, Seq(
      NewStreamMessage(mid(1), "opened", """{"balance":0}"""),
      NewStreamMessage(mid(2), "credited", """{"amount":100}""")))
    println(s"replay returned head (no new rows): $r3")

    println("== wrong expected version ==")
    try store.appendToStream("account-1", 0, Seq(NewStreamMessage(mid(9), "x", "{}")))
    catch { case e: WrongExpectedVersionException => println(s"caught: ${e.getMessage}") }

    println("== read stream forwards ==")
    store.readStreamForwards("account-1").messages.foreach(m =>
      println(s"  v${m.streamVersion} p${m.position} ${m.`type`} ${m.jsonData}"))

    println("== read all backwards ==")
    store.readAllBackwards().messages.foreach(m =>
      println(s"  p${m.position} ${m.streamId} ${m.`type`}"))

    println("== metadata + retention ==")
    store.setStreamMetadata("account-1", maxCount = Some(1))
    println(s"after maxCount=1 scavenge: " +
      store.readStreamForwards("account-1").messages.map(m => s"v${m.streamVersion}").mkString(","))

    println("== list streams ==")
    println("  all: " + store.listStreams().streamIds.mkString(", "))
    println("  account-*: " + store.listStreams(Pattern.StartsWith("account-")).streamIds.mkString(", "))

    println("== subscription catch-up ==")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val latch = new java.util.concurrent.CountDownLatch(1)
    val sub = Subscriptions.subscribeToAll(store, None,
      m => seen.add(s"${m.streamId}@p${m.position}"),
      b => if (b) latch.countDown())
    latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
    store.appendToStream("account-2", 0, Seq(NewStreamMessage(mid(4), "debited", """{"amount":5}""")))
    Thread.sleep(2000)
    sub.close()
    println("  delivered: " + String.join(", ", seen))

    println("== all-stream as DataFrame (Spark-native surface) ==")
    store.allMessages.orderBy("position").show(20, truncate = false)

    println("== HTTP surface (server + client over the same store) ==")
    val server = new graft.http.StreamStoreHttpServer(store)
    val httpStore = new graft.http.HttpStreamStore(server.baseUrl)
    val httpAppend = httpStore.appendToStream("http-stream", ExpectedVersion.NoStream,
      Seq(NewStreamMessage(mid(10), "via-http", """{"transport":"http"}""")))
    val httpRead = httpStore.readStreamForwards("http-stream")
    println(s"  appended over HTTP at position ${httpAppend.currentPosition}; " +
      s"read back ${httpRead.messages.size} message(s), head=${httpStore.readHeadPosition()}")
    require(httpRead.messages.head.jsonData == """{"transport":"http"}""")
    server.close()

    store.close()

    println("== JDBC backend (embedded Derby, same StreamStore contract) ==")
    val jdbcDir = java.nio.file.Files.createTempDirectory("graft-demo-jdbc").toString
    val jdbc = new graft.store.JdbcStreamStore(spark, s"jdbc:derby:$jdbcDir/db;create=true")
    val jr = jdbc.appendToStream("jdbc-stream", ExpectedVersion.NoStream,
      Seq(NewStreamMessage(mid(20), "via-jdbc", """{"backend":"derby"}""")))
    println(s"  appended via JDBC at position ${jr.currentPosition}; " +
      s"partitioned Spark read sees ${jdbc.allMessages().count()} row(s)")
    require(jdbc.readStreamForwards("jdbc-stream").messages.head.jsonData == """{"backend":"derby"}""")
    jdbc.close()

    spark.stop()
    println("DEMO OK")
  }
}
