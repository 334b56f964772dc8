package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width bitset union as ONE aggregate pass — the build side of a
  * Bloom-filter membership gate.
  *
  * Input per row: an `array<long>` of bit positions in `[0, numBits)`
  * (graft.api.Dedup.bloomPositions — k affine re-hashes of a 28-bit
  * content hash). The aggregate ORs every row's bits into a
  * `numBits/64`-word buffer; partial buffers OR-merge, so a corpus scan
  * reduces map-side to one `numBits/8`-byte buffer per task regardless
  * of row count — the shape that lets a 100 TB corpus build a
  * megabyte-scale filter in a single shuffle-light pass, then broadcast
  * it to probe daily ingest batches.
  *
  * Output: `array<long>` of the bitset words (little-endian bit order:
  * position p lives in word p/64 at bit p%64). Out-of-range and null
  * positions are ignored (the position builder never emits them; being
  * lenient keeps the aggregate reusable on raw inputs).
  *
  * numBits must be a foldable positive multiple of 64 — it sizes the
  * compiled buffer.
  */
case class BitsetAgg(
    positions: Expression,
    numBitsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val numBits: Int = {
    require(numBitsExpr.foldable, "bitset_agg numBits must be foldable")
    val n = numBitsExpr.eval().asInstanceOf[Number].intValue()
    require(n > 0 && n % 64 == 0, s"bitset_agg numBits must be a positive multiple of 64, got $n")
    n
  }
  private val numWords = numBits / 64

  override def children: Seq[Expression] = positions :: numBitsExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = positions.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val p = arr.getLong(i)
          if (p >= 0 && p < numBits)
            buf((p >> 6).toInt) |= (1L << (p & 63))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numWords)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numWords)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitsetAgg =
    copy(positions = newChildren(0), numBitsExpr = newChildren(1))

  override def prettyName: String = "bitset_agg"
}
