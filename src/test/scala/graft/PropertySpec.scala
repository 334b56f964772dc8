package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (deterministic sample sweep) for the pure
  * primitives every oracle check leans on — no Spark session needed:
  * hash ranges, affine re-hash closure, canonical-pair symmetry, and
  * the minhash sketch's merge algebra.
  */
class PropertySpec extends AnyFunSuite {

  import graft.ops.TextHash.P

  // Deterministic sample stream (splitmix64) — reproducible, no RNG seed
  // state shared with anything else.
  private def samples(n: Int, seed: Long = 42L): Seq[Long] = {
    var x = seed
    (1 to n).map { _ =>
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  test("affine re-hash stays inside [0, P) for any 28-bit hash and j") {
    for (h <- samples(500).map(v => math.floorMod(v, 1L << 28)); j <- 0 until 16) {
      val a = ((2L * j + 1) * h + j.toLong * j + 7) % P
      assert(a >= 0 && a < P, s"h=$h j=$j -> $a")
    }
  }

  test("integer-mix bucket is in [0, 100) and equals the ideal Knuth mix for any key") {
    // floorMod IS Spark's pmod for a positive modulus — this models the
    // actual Column expression in Sampling.mixBucket: the key is
    // pre-reduced into the modulus and multiplied by the REDUCED
    // constant (2654435761 ≡ 427799 mod 1000003), which never leaves
    // int64 for any key. The BigInt form is the ideal (overflow-free)
    // k·2654435761 mod 1000003 mod 100 — the reduced form must equal it
    // EVERYWHERE, including the 10¹⁰-scale keys where the raw int64
    // product used to throw ANSI overflow (sf10 checkpoint catch); the
    // splitmix sample stream covers negative and overflowing keys.
    for (k <- samples(2000)) {
      val red = math.floorMod(math.floorMod(k, 1000003L) * 427799L, 1000003L)
      val b = math.floorMod(red, 100L)
      assert(b >= 0 && b < 100, s"k=$k -> $b")
      val ideal = ((BigInt(k) * BigInt(2654435761L)) mod BigInt(1000003L)) % 100
      assert(BigInt(b) == ideal, s"k=$k reduced $b != ideal $ideal")
    }
  }

  test("simhash band layout: every band covers >= 1 real bit, all 32 covered") {
    // The floor partition lo = k*32/n, hi = (k+1)*32/n used by
    // Dedup.simhashNearDups: no band may be empty (an empty band is a
    // constant-0 key whose equality join IS the all-pairs product).
    for (maxHamming <- 0 until 32) {
      val n = maxHamming + 1
      val bounds = (0 to n).map(k => k * 32 / n)
      assert(bounds.head == 0 && bounds.last == 32)
      for (k <- 0 until n)
        assert(bounds(k + 1) - bounds(k) >= 1, s"empty band $k of $n")
    }
  }

  test("minhash sketch: split-merge equals one-shot; serde round-trips") {
    import graft.functions.MinHashSketch
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = MinHashSketch(BoundReference(0, LongType, nullable = true))
    for (size <- Seq(1, 2, 7, 100); split <- Seq(0, 1, size / 2, size)) {
      val hs = samples(size, seed = size * 31 + split)
        .map(v => math.floorMod(v, 1L << 28))
      val whole = hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        agg.update(b, InternalRow(h))
      }
      val (l, r) = hs.splitAt(split)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val merged = agg.merge(bl, br)
      assert(merged.toSeq == whole.toSeq, s"size=$size split=$split")
      assert(agg.deserialize(agg.serialize(merged)).toSeq == merged.toSeq)
    }
  }

  test("empty sketch buffer evals to all-MaxValue slots (min over empty)") {
    import graft.functions.MinHashSketch
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = MinHashSketch(BoundReference(0, LongType, nullable = true))
    assert(agg.createAggregationBuffer().forall(_ == Long.MaxValue))
  }

  test("kmv sketch: k smallest distinct values exactly; split-merge; serde; dup-proof") {
    import graft.functions.KmvSketch
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.LongType
    for (k <- Seq(1, 4, 16); size <- Seq(0, 1, 3, 16, 200); split <- Seq(0, 1, size / 2)) {
      val agg = KmvSketch(BoundReference(0, LongType, nullable = true), Literal(k))
      // Duplicates planted via the mod: distinctness must be enforced.
      val hs = samples(size, seed = k * 1009 + size * 31 + split)
        .map(v => math.floorMod(v, 64L))
      val whole = hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        agg.update(b, InternalRow(h))
      }
      val (l, r) = hs.splitAt(split)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val merged = agg.merge(bl, br)
      import scala.jdk.CollectionConverters._
      val expect = hs.distinct.sorted.take(k)
      assert(whole.asScala.toSeq.map(Long.unbox) == expect, s"k=$k size=$size")
      assert(merged.asScala.toSeq.map(Long.unbox) == expect, s"k=$k size=$size split=$split")
      val rt = agg.deserialize(agg.serialize(merged))
      assert(rt.asScala.toSeq == merged.asScala.toSeq)
    }
  }

  test("hll sketch: registers match an independent reference; split-merge; serde") {
    import graft.functions.HllSketch
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.LongType
    // Independent register computation: pure-Scala bit arithmetic on the
    // 28-bit hash, no shared code with the aggregate's update path.
    def refRegs(hs: Seq[Long], p: Int): Seq[Int] = {
      val m = 1 << p; val rb = 28 - p
      val regs = Array.fill(m)(0)
      hs.foreach { h =>
        val idx = (h >>> rb).toInt
        val rem = h & ((1L << rb) - 1)
        val rank = if (rem == 0) rb + 1
          else rb + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
        if (rank > regs(idx)) regs(idx) = rank
      }
      regs.toSeq
    }
    for (p <- Seq(4, 8, 12); size <- Seq(0, 1, 100, 3000); split <- Seq(0, size / 3)) {
      val agg = HllSketch(BoundReference(0, LongType, nullable = true), Literal(p))
      val hs = samples(size, seed = p * 7919 + size)
        .map(v => math.floorMod(v, 1L << 28))
      val whole = hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        agg.update(b, InternalRow(h))
      }
      val (l, r) = hs.splitAt(split)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, h) => agg.update(b, InternalRow(h)) }
      val merged = agg.merge(bl, br)
      val expect = refRegs(hs, p)
      assert(whole.map(_.toInt).toSeq == expect, s"p=$p size=$size")
      assert(merged.map(_.toInt).toSeq == expect, s"p=$p size=$size split=$split")
      val rt = agg.deserialize(agg.serialize(merged))
      assert(rt.toSeq == merged.toSeq)
      // Every register rank stays within the 28-bit contract.
      assert(expect.forall(r2 => r2 >= 0 && r2 <= 28 - p + 1))
    }
  }

  test("bitset agg: split-merge equals one-shot union; serde round-trips; bounds ignored") {
    import graft.functions.BitsetAgg
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val numBits = 256
    val agg = BitsetAgg(
      BoundReference(0, ArrayType(LongType), nullable = true), Literal(numBits))
    def row(ps: Seq[Long]) = InternalRow(new GenericArrayData(ps.toArray))
    for (size <- Seq(1, 3, 50); split <- Seq(0, 1, size / 2, size)) {
      // Position lists include out-of-range values the agg must ignore.
      val rows = samples(size, seed = size * 17 + split).map { v =>
        Seq(math.floorMod(v, numBits).toLong,
          math.floorMod(v >> 9, numBits).toLong, -1L, numBits.toLong + 5)
      }
      val whole = rows.foldLeft(agg.createAggregationBuffer()) { (b, ps) =>
        agg.update(b, row(ps))
      }
      val (l, r) = rows.splitAt(split)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, ps) => agg.update(b, row(ps)) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, ps) => agg.update(b, row(ps)) }
      val merged = agg.merge(bl, br)
      assert(merged.toSeq == whole.toSeq, s"size=$size split=$split")
      assert(agg.deserialize(agg.serialize(merged)).toSeq == merged.toSeq)
      // Exact bit semantics vs a reference Set of in-range positions.
      val expect = rows.flatten.filter(p => p >= 0 && p < numBits).toSet
      val got = (0 until numBits).filter(p => (merged(p >> 6) >> (p & 63) & 1L) == 1L)
      assert(got.toSet == expect.map(_.toInt), s"size=$size split=$split")
    }
  }

  test("quantile sketch: bucket bounds/monotonicity; split-merge; serde; rank exactness") {
    import graft.functions.QuantileSketch
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    // Bucket function: monotone, value within [lo, lo·(1+2^-5))-ish —
    // the contract the quantile estimate's error bound rests on.
    val probes = Seq(0L, 1L, 63L, 64L, 65L, 127L, 128L, 12345L,
      987654321L, Long.MaxValue) ++
      samples(2000, seed = 31L).map(v => math.abs(v % (1L << 50)))
    var prevB = -1
    probes.sorted.foreach { x =>
      val b = QuantileSketch.bucketOf(x)
      assert(b >= 0 && b < QuantileSketch.Buckets, s"x=$x b=$b")
      assert(b >= prevB, s"bucket not monotone at x=$x")
      prevB = b
      val lo = QuantileSketch.loOf(b)
      assert(lo <= math.max(x, 0L), s"x=$x lo=$lo")
      // Relative quantization error ≤ 2^-5 (values < 64 are exact).
      if (x >= 64) assert((x - lo).toDouble / x <= 1.0 / 32 + 1e-12,
        s"x=$x lo=$lo err=${(x - lo).toDouble / x}")
      else assert(lo == math.max(x, 0L))
    }
    val agg = QuantileSketch(BoundReference(0, LongType, nullable = true))
    for (size <- Seq(0, 1, 100, 5000); split <- Seq(0, size / 3)) {
      val xs = samples(size, seed = size * 13 + 7)
        .map(v => math.abs(v % 10000000L))
      val whole = xs.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
        agg.update(b, InternalRow(x)) }
      val (l, r) = xs.splitAt(split)
      val bl = l.foldLeft(agg.createAggregationBuffer()) { (b, x) => agg.update(b, InternalRow(x)) }
      val br = r.foldLeft(agg.createAggregationBuffer()) { (b, x) => agg.update(b, InternalRow(x)) }
      val merged = agg.merge(bl, br)
      // Merge law is EXACT for count histograms: bucketwise identical.
      assert(merged.toSeq == whole.toSeq, s"size=$size split=$split")
      assert(agg.deserialize(agg.serialize(merged)).toSeq == merged.toSeq)
      assert(merged.sum == size.toLong, "total count conserved")
      if (size > 0) {
        // Rank is exact: the sketch median's bucket must CONTAIN the
        // true median (lo ≤ exact median, next bucket's lo > it is not
        // required — quantization moves the value, never the rank).
        val sorted = xs.sorted
        val rank = (size * 50 + 99) / 100 // ceil(n/2), the query's rule
        val exactMedian = sorted(rank - 1)
        var cum = 0L
        var est = -1L
        var i = 0
        while (i < QuantileSketch.Buckets && est < 0) {
          cum += merged(i)
          if (cum >= rank) est = QuantileSketch.loOf(i)
          i += 1
        }
        assert(est >= 0)
        assert(est <= exactMedian, s"size=$size est=$est exact=$exactMedian")
        if (exactMedian >= 64)
          assert((exactMedian - est).toDouble / exactMedian <= 1.0 / 32 + 1e-12,
            s"median rel err too big: est=$est exact=$exactMedian")
        else assert(est == exactMedian)
      }
    }
  }

  test("codec sniffs never throw on arbitrary bytes; accepted payloads decode") {
    // The registry sniffs run on EVERY row of a binary media column —
    // at 100 TB a payload that makes a sniff throw kills the task (and
    // with it the stage, and with retries the job). Property: for any
    // byte string, isBmp/isPnm/isWav return a Boolean without throwing,
    // and whenever a sniff accepts, decode completes without throwing.
    import graft.multimodal.{BmpCodec, PnmCodec, WavCodec}
    val rnd = samples(4000).iterator
    def bytes(n: Int): Array[Byte] = Array.fill(n)((rnd.next() & 0xff).toByte)
    def check(p: Array[Byte]): Unit = {
      if (BmpCodec.isBmp(p)) BmpCodec.decode(p)
      if (PnmCodec.isPnm(p)) PnmCodec.decode(p)
      if (WavCodec.isWav(p)) WavCodec.decode(p)
    }
    // Pure noise, including the magic prefixes followed by garbage.
    for (n <- Seq(0, 1, 2, 13, 44, 61, 200)) check(bytes(n))
    for (magic <- Seq("BM", "P5", "P6", "RIFF", "RIFFxxxxWAVE"))
      check(magic.getBytes("US-ASCII") ++ bytes(80))
    // Mutations of VALID payloads: every single-byte corruption and
    // truncation of a real header region must keep the contract.
    val valid = Seq(
      BmpCodec.encode(3, 2, Array.fill(6)(0x336699)),
      PnmCodec.encodePpm(3, 2, Array.fill(6)(0x336699)),
      WavCodec.encode(8000, 2, Array[Short](1, -1, 300, -300)))
    for (v <- valid) {
      for (i <- v.indices.take(60); b <- Seq(0x00, 0xff, 0x80)) {
        val m = v.clone(); m(i) = b.toByte; check(m)
      }
      for (cut <- 0 until math.min(v.length, 60)) check(v.take(cut))
    }
    // Randomized round-trips (identity, not just no-throw).
    for (trial <- 1 to 20) {
      val w = 1 + (rnd.next() & 0x7).toInt; val h = 1 + (rnd.next() & 0x7).toInt
      val px = Array.fill(w * h)((rnd.next() & 0xffffff).toInt)
      assert(BmpCodec.decode(BmpCodec.encode(w, h, px))._3.sameElements(px))
      assert(PnmCodec.decode(PnmCodec.encodePpm(w, h, px))._4.sameElements(px))
      val ch = 1 + (trial % 2)
      val pcm = Array.fill((4 + (rnd.next() & 0x1f).toInt) * ch)(rnd.next().toShort)
      val (dc, dr, ds) = WavCodec.decode(WavCodec.encode(16000, ch, pcm))
      assert(dc == ch && dr == 16000 && ds.sameElements(pcm))
    }
  }
}

/** The ml_auc_exact / ml_lift_curve bounded-window contract, measured:
  * their unpartitioned cumulative windows run over the DISTINCT
  * Adamic-Adar score domain, which tracks the distinct common-neighbor
  * degree multisets — not the pair count — and saturates as degrees
  * repeat (builder-measured 3 846 / 2 547 / 9 769 distinct scores for
  * 7.5k / 75k / 750k pairs at sf0.01/0.1/1). */
class AaScoreDomainSpec extends SparkSpec {
  test("distinct AA scores saturate as pairs grow 10x (two corpus sizes)") {
    def profile(dir: String): (Long, Long) = {
      val f = graft.ops.MLPack.aaScored(spark, dir)
      (f.count(), f.select("score").distinct().count())
    }
    val (nSmall, dSmall) = profile(sf("sf0.01"))
    val (nBig, dBig) = profile(sf("sf0.1"))
    assert(nBig >= 9 * nSmall, "fixture sanity: pairs scale ~10x")
    // Density of distinct scores must FALL as the corpus grows — the
    // saturation that keeps the distribution-sized window bounded.
    assert(dBig.toDouble / nBig < dSmall.toDouble / nSmall,
      s"score-domain density must fall: $dBig/$nBig vs $dSmall/$nSmall")
    // And the domain itself must grow far slower than the pairs.
    assert(dBig < 3 * dSmall,
      s"distinct scores grew super-linearly: $dSmall -> $dBig for 10x pairs")
  }

}
