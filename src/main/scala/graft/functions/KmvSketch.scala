package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as ONE aggregate pass —
  * a custom `TypedImperativeAggregate` carrying the k smallest DISTINCT
  * hash values seen (Bar-Yossef et al. 2002; the classic mergeable
  * cardinality estimator).
  *
  * Why not `distinct().orderBy().limit(k)`: that shape shuffles every
  * distinct hash in the corpus to find the k smallest. This aggregate's
  * partial buffers hold at most k longs each, so a 100 TB scan reduces
  * map-side to one ≤8k-byte buffer per task through the exchange — the
  * same shuffle-light discipline as MinHashSketch / BitsetAgg.
  *
  * Input: a hash value uniform on [0, M) (LongType — TextHash.h28 gives
  * M = 2^28 and keeps the estimate bit-reproducible in DuckDB, which
  * replays the same top-k via SQL). Output: `array<long>` of the ≤k
  * smallest distinct hashes in ascending order; the caller derives
  * k_used = size, kth = last element, estimate = (k_used − 1)·M / kth.
  * Unlike HLL the sketch is exact arithmetic over exact hashes — two
  * engines (or two runs) always agree bit-for-bit.
  *
  * k must be a foldable positive int — it bounds the compiled buffer.
  */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  private val k: Int = {
    require(kExpr.foldable, "kmv_sketch k must be foldable")
    val n = kExpr.eval().asInstanceOf[Number].intValue()
    require(n > 0, s"kmv_sketch k must be positive, got $n")
    n
  }

  override def children: Seq[Expression] = child :: kExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def add(buf: JTreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: JTreeSet[java.lang.Long], b2: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "kmv_sketch"
}
