package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch as ONE aggregate pass — a custom
  * `TypedImperativeAggregate` carrying a log-linear bucket histogram
  * (the HdrHistogram / DDSketch bucket family: binary octaves split
  * into 2^5 = 32 linear sub-buckets each), completing the sketch
  * battery's quantile member next to [[KmvSketch]]/[[HllSketch]]/CMS/
  * Bloom/MinHash. `ana_quantiles`/`ana_group_quantiles` promise this
  * swap-in as their 100 TB path.
  *
  * Why buckets instead of GK/KLL/t-digest: those compact based on
  * arrival order (GK/KLL) or centroid drift (t-digest), so their final
  * state is NOT a pure function of the input multiset — unverifiable by
  * a relational oracle and dependent on partitioning. Here the bucket
  * of a value is a pure integer function of the value alone, so the
  * sketch of a multiset is canonical: merge = bucketwise count ADD, and
  * sketch(A ∪ B) ≡ merge(sketch A, sketch B) EXACTLY (the merge law
  * `ana_qsketch_merge` probes at runtime). The price is a value-domain
  * bound instead of an n bound: ≤ 1920 buckets covers all of [0, 2^63)
  * — 15 KB per (task, group) worst case, constant in row count. At
  * 100 TB the per-segment quantile profile reduces map-side to that
  * bounded buffer through the exchange, and yesterday's sketches merge
  * with today's without re-scanning history.
  *
  * Accuracy: rank is EXACT (counts are exact); the value is quantized
  * to its bucket's lower bound, a relative error ≤ 2^-5 ≈ 3.1% (values
  * < 64 are exact — one bucket per integer).
  *
  * Determinism contract (what makes this oracle-checkable where
  * quantile sketches usually are not): input is a NON-NEGATIVE long
  * (callers pre-scale, e.g. price cents); bucket/lower-bound are pure
  * bit arithmetic (`numberOfLeadingZeros` + shifts) that DuckDB replays
  * with `length(bin(x))` and `>>`/`<<` — the identical integer on every
  * input, so the whole sketch hash-matches a relational GROUP BY.
  *
  * Input: LongType ≥ 0 (negatives clamp to bucket 0 rather than corrupt
  * memory — this is a registered SQL function, a caller CAN feed
  * anything). Output: `array<struct<b:int, lo:bigint, cnt:bigint>>`
  * sorted by bucket id — only touched buckets are emitted.
  */
case class QuantileSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import QuantileSketch._

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", IntegerType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(bucketOf(v.asInstanceOf[Long])) += 1L
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Buckets) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = Seq.newBuilder[InternalRow]
    var i = 0
    while (i < Buckets) {
      if (buf(i) > 0L)
        rows += new GenericInternalRow(Array[Any](i, loOf(i), buf(i)))
      i += 1
    }
    new GenericArrayData(rows.result().toArray[Any])
  }

  /** Sparse (bucket, count) pairs — a near-empty group costs ~8 bytes
    * on the wire instead of the dense 15 KB. */
  override def serialize(buf: Array[Long]): Array[Byte] = {
    var n = 0
    var i = 0
    while (i < Buckets) { if (buf(i) != 0L) n += 1; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + n * 12)
    bb.putInt(n)
    i = 0
    while (i < Buckets) {
      if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Buckets)
    val n = bb.getInt
    var j = 0
    while (j < n) { val i = bb.getInt; buf(i) = bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren(0))

  override def prettyName: String = "qsketch"
}

object QuantileSketch {
  /** Sub-bucket bits per octave: 2^5 = 32 linear sub-buckets → value
    * quantization error ≤ 2^-5. */
  val SubBits = 5
  private val Subs = 1 << SubBits

  /** Bucket-id ceiling: values < 64 get identity buckets 0..63; above,
    * bucket = shift·32 + top-6-bits ≤ 57·32 + 63 = 1887 for any
    * positive long. 1920 rounds up to a 60-octave boundary. */
  val Buckets = 1920

  /** Pure integer bucket of a value — monotone non-decreasing, exact
    * below 2^(SubBits+1). DuckDB twin:
    * `CASE WHEN x < 64 THEN x
    *  ELSE (length(bin(x))-6)*32 + (x >> (length(bin(x))-6)) END`. */
  def bucketOf(x: Long): Int =
    if (x <= 0L) 0
    else if (x < (Subs << 1)) x.toInt
    else {
      val m = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val sh = m - (SubBits + 1)
      (sh * Subs + (x >>> sh)).toInt
    }

  /** Lower bound (inclusive) of a bucket — the deterministic value
    * representative quantile extraction reports. DuckDB twin:
    * `CASE WHEN b < 64 THEN b
    *  ELSE CAST(b - (b//32 - 1)*32 AS BIGINT) << (b//32 - 1) END`. */
  def loOf(b: Int): Long =
    if (b < (Subs << 1)) b.toLong
    else {
      val sh = b / Subs - 1
      (b - sh * Subs).toLong << sh
    }
}
