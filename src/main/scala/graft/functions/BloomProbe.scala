package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression.
  *
  * The use case is the decontamination scale path
  * ([[graft.operators.Dedup.bloomContamination]]): when the eval-set
  * shingle SET is too large to broadcast as a join hash table (10^9
  * 8-byte hashes ≈ 8 GB + hash-table overhead), its Bloom filter at 1%
  * fpp is ~1.2 GB and ships inside the serialized plan, and the corpus
  * side drops ~99% of its shingle rows map-side before any shuffle.
  *
  * Spark's own `BloomFilterMightContain` is internal to its runtime-
  * filter rewrite and not constructible from the public API, so this is
  * the same idea exposed as a library expression: the filter travels as
  * its serialized bytes (java-serializable for the plan), deserializes
  * lazily ONCE per executor, and `doGenCode` emits a single virtual call
  * — the probe stays inside whole-stage codegen like the TextHash
  * family. */
object BloomProbe {

  /** `mightContainLong(bf, c)`: true when `c` (LongType) might be in the
    * filter — no false negatives, `fpp` false positives. */
  def mightContainLong(filter: BloomFilter, c: Column): Column =
    ColumnGlue.column(BloomMightContainLong(ColumnGlue.expression(c), serialize(filter)))

  def serialize(f: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** `bloom_might_contain_long(h)`: Boolean membership probe of a long
  * against a plan-shipped Bloom filter. */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  // one filter instance per deserialized expression (= per executor task
  // binary), shared across rows; the bytes field is what serializes
  @transient private lazy val filter = BloomProbe.deserialize(filterBytes)

  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
