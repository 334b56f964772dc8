package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog register sketch as ONE aggregate pass — a custom
  * `TypedImperativeAggregate` carrying the 2^p max-rank registers
  * (Flajolet et al. 2007; the industry-standard mergeable cardinality
  * estimator, the structure behind Spark's own approx_count_distinct).
  *
  * Why a second sketch next to [[KmvSketch]]: KMV keeps the k smallest
  * hashes — exact values, variable content; HLL keeps a FIXED 2^p-byte
  * register file whose merge is elementwise max, the shape that unions
  * across days/partitions/tables for free. The register file for p=8 is
  * 256 bytes per (task, group) — at 100 TB the per-segment cardinality
  * profile reduces map-side to a constant-size buffer per task through
  * the exchange, and yesterday's sketches merge with today's without
  * touching the raw keys again.
  *
  * Determinism contract (what makes this oracle-checkable where HLL
  * usually is not): the input is the exact 28-bit `TextHash.h28` hash,
  * registers are integer maxima, and the estimator's float work is
  * limited to (a) a sum of exact dyadic rationals 2^-r (r ≤ 21, total
  * < 2^8 — every partial sum is exactly representable in a double, so
  * summation ORDER cannot matter) and (b) one alpha·m²/Z division both
  * engines evaluate identically. The DuckDB twin replays idx/rank with
  * `//`, `%`, and `length(bin(rem))` and lands on the identical double.
  *
  * Input: a hash uniform on [0, 2^28) (LongType); p must be a foldable
  * int in [4, 16]. Output: `array<int>` of 2^p register values, index =
  * top-p hash bits, value = max over hashes of (28−p+1 − bitlength of
  * the low 28−p bits), 0 for never-touched registers.
  */
case class HllSketch(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val p: Int = {
    require(pExpr.foldable, "hll_sketch p must be foldable")
    val n = pExpr.eval().asInstanceOf[Number].intValue()
    require(n >= 4 && n <= 16, s"hll_sketch p must be in [4,16], got $n")
    n
  }
  private val m = 1 << p
  private val remBits = 28 - p
  private val remMask = (1L << remBits) - 1L

  override def children: Seq[Expression] = child :: pExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Registers as bytes — max rank is 28−p+1 ≤ 25, fits comfortably. */
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private val h28Mask = (1L << 28) - 1L

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // The contract is a hash uniform on [0, 2^28); this is a registered
      // SQL function, so a caller CAN feed anything. Mask to the low 28
      // bits: in-contract inputs are unchanged, out-of-range inputs land
      // on a valid register instead of corrupting memory or throwing in
      // an executor (estimates are then merely as good as the hash fed in).
      val h = v.asInstanceOf[Long] & h28Mask
      val idx = (h >>> remBits).toInt
      val rem = h & remMask
      // rank = 1 + number of leading zero bits of the remBits-wide
      // remainder; rem == 0 means all remBits bits are zero.
      val rank =
        if (rem == 0L) remBits + 1
        else remBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren(0), pExpr = newChildren(1))

  override def prettyName: String = "hll_sketch"
}
