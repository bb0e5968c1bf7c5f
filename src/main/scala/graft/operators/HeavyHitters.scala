package graft.operators

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact frequent-item mining at corpus scale via a two-pass
  * sketch-then-recount plan.
  *
  * A plain `GROUP BY token HAVING count >= T` shuffles EVERY distinct
  * token — at 100 TB the token dictionary is billions of keys and the
  * shuffle is the job. The classic fix (Misra–Gries / the "mergeable
  * summaries" line of work, Agarwal et al., PODS'12) bounds state to k
  * counters per partial aggregate with the guarantee: any item with true
  * frequency > N/(k+1) SURVIVES the sketch. So:
  *
  *   pass 1: one partial-aggregation pass over the tokens — per-partition
  *           MG sketches (≤ k counters each) merge up a tree to ≤ k
  *           candidate tokens + the exact total N. The "shuffle" is
  *           #partitions × k counters, independent of data volume.
  *   pass 2: exact recount of ONLY the candidates: the ≤ k candidate
  *           strings become an `isin` literal pushed into the parquet
  *           scan, then a groupBy over rows that survive it (a ≤ k-key
  *           aggregation).
  *
  * When `threshold > N/(k+1)` (checked at runtime against the pass-1 N),
  * the result is BIT-EXACT equal to the naive global GROUP BY — which is
  * exactly what the DuckDB oracle runs. Approximation buys the plan
  * shape, not the answer.
  */
object HeavyHitters {

  /** `misra_gries(c, k)` aggregate: ≤ k candidate strings (sorted) that
    * cover every item with true count > N/(k+1). */
  def misraGries(c: Column, k: Int): Column =
    ColumnGlue.column(
      MisraGriesAgg(ColumnGlue.expression(c), k).toAggregateExpression())

  /** All `tokenCol` values with exact count ≥ `ceil(N / divisor)` (N =
    * total token count), mined with bounded state. The relative
    * threshold keeps ONE query exactness-guaranteed at every scale
    * factor: `divisor < k+1` implies `ceil(N/divisor) > N/(k+1)` for any
    * N > 0, so the MG sketch provably misses nothing above the cut.
    * Output: (token, cnt) — identical to the naive global GROUP BY with
    * the same HAVING.
    *
    * The ≤ k candidates do come to the driver: that is the point — k is
    * a query parameter (hundreds..thousands), not data-sized, and the
    * literal list rides into the second scan as a pushed filter. */
  def frequentTokens(
      tokens: DataFrame, tokenCol: String, k: Int, divisor: Long): DataFrame = {
    require(divisor > 0 && divisor < k + 1,
      s"exactness needs divisor < k+1 ($divisor vs ${k + 1})")
    val row = tokens
      .agg(count(lit(1)).as("n"), misraGries(col(tokenCol), k).as("cand"))
      .head()
    val n = row.getLong(0)
    val threshold = (n + divisor - 1) / divisor
    val cand = row.getSeq[String](1)
    if (cand.isEmpty) return tokens.sparkSession.emptyDataFrame
      .selectExpr(s"'' AS ${tokenCol}", "CAST(0 AS BIGINT) AS cnt").limit(0)
    tokens
      .filter(col(tokenCol).isin(cand: _*))
      .groupBy(tokenCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}

/** Misra–Gries sketch as a [[TypedImperativeAggregate]]: per-buffer
  * state is ≤ `k` (string, count) pairs; `merge` is the counter-sum /
  * subtract-(k+1)-th-largest rule that keeps the summary mergeable with
  * the same error bound (Agarwal et al., PODS'12, §3.1). `eval` returns
  * the candidate strings sorted, so the aggregate's value is
  * deterministic regardless of partitioning. */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "sketch width k must be positive")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String].toString
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None if buf.size < k => buf.update(s, 1L)
      case None =>
        // decrement-all: amortized O(1) — each pass retires k+1 units of
        // total count (k in the buffer + this item), so across N updates
        // there are ≤ N/(k+1) passes of cost O(k)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0:
      // leaves ≤ k survivors and adds ≤ that count of error — the
      // mergeable-summaries bound
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val arr: Array[Any] =
      buf.keys.toArray.sorted.map(s => UTF8String.fromString(s): Any)
    new GenericArrayData(arr)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
