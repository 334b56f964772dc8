package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE aggregate pass — a custom
  * `TypedImperativeAggregate` with a fixed 16-slot buffer.
  *
  * The explode-based formulation (graft.ops.DedupPack: explode shingles ×
  * explode 16 hash indices → groupBy min) multiplies the shuffle by
  * NumHashes; at 100 TB that is 16× the rows through the exchange. This
  * aggregate keeps the per-row work identical (16 affine re-hashes of the
  * 28-bit shingle hash, graft.ops.TextHash semantics) but carries a
  * single 128-byte buffer per group through partial aggregation — the
  * map-side combine does almost all the work.
  *
  * Input: the 28-bit shingle hash (LongType, from TextHash.h28).
  * Output: array<long> of NumHashes signature slots; empty groups yield
  * slots of Long.MaxValue (no shingles — matches min-over-empty).
  *
  * Ref: the dedup pipeline this accelerates mirrors transformer.py's
  * dedup stages re-designed for scale (SURVEY.md §2.3 + training-data
  * pack); the affine family is (2j+1)·h + j² + 7 mod (2^31−1).
  */
case class MinHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import graft.ops.TextHash.{NumSketchHashes, P}

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(NumSketchHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < NumSketchHashes) {
        val a = ((2L * j + 1) * h + j.toLong * j + 7) % P
        if (a < buf(j)) buf(j) = a
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumSketchHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * NumSketchHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumSketchHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sketch"
}
