package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsAgg, CmsInnerProduct, CosineSim, DdSketch, DdsAgg, DdsMergeAgg, MinHashSig, RollingHash64, SpaceSaving}

/** Algebraic laws the distributed execution model depends on, checked by
  * ScalaCheck over randomized inputs. Every property here is the pure
  * (interpreted-eval) core of an expression whose DISTRIBUTED correctness
  * reduces to exactly this law: sketch merge must equal single-pass build
  * (map-side combine), minhash must be a semilattice hom (mergeable
  * signatures), rolling hash must satisfy its own recurrence (incremental
  * fingerprinting). No SparkSession — hundreds of cases run in-process. */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: $res")
  }

  private def strArray(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val tokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dog", "cat", "xyzzy", "q",
      "lorem", "ipsum", "42"))

  // ---- MinHashSig: semilattice homomorphism --------------------------

  test("minhash: sig(A ++ B) is the elementwise min of sig(A), sig(B)") {
    val expr = MinHashSig(BoundReference(0, ArrayType(StringType), true), 16)
    def sig(xs: Seq[String]): Array[Long] =
      expr.nullSafeEval(strArray(xs)).asInstanceOf[ArrayData].toLongArray()
    check("minhash-merge", Prop.forAll(tokens, tokens) { (a, b) =>
      val merged = sig(a ++ b)
      val expect = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      merged.sameElements(expect)
    })
  }

  test("minhash: signature has set semantics (order and dups irrelevant)") {
    val expr = MinHashSig(BoundReference(0, ArrayType(StringType), true), 16)
    def sig(xs: Seq[String]): Seq[Long] =
      expr.nullSafeEval(strArray(xs)).asInstanceOf[ArrayData].toLongArray().toSeq
    check("minhash-set", Prop.forAll(tokens) { a =>
      sig(a) == sig(scala.util.Random.shuffle(a ++ a))
    })
  }

  // ---- CmsAgg: map-side combine correctness --------------------------

  private def cmsOf(keys: Seq[Long], depth: Int = 3, width: Int = 64)
  : Array[Long] = {
    val agg = CmsAgg(BoundReference(0, LongType, true), depth, width)
    val buf = agg.createAggregationBuffer()
    keys.foreach(k => agg.update(buf, new GenericInternalRow(Array[Any](k))))
    buf
  }

  private val keys: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 40L))

  test("cms: merging per-partition sketches equals the single-pass sketch") {
    val agg = CmsAgg(BoundReference(0, LongType, true), 3, 64)
    check("cms-merge", Prop.forAll(keys, keys) { (a, b) =>
      val merged = agg.merge(cmsOf(a), cmsOf(b))
      merged.sameElements(cmsOf(a ++ b))
    })
  }

  test("cms: serialization round-trips") {
    val agg = CmsAgg(BoundReference(0, LongType, true), 3, 64)
    check("cms-serde", Prop.forAll(keys) { a =>
      agg.deserialize(agg.serialize(cmsOf(a))).sameElements(cmsOf(a))
    })
  }

  test("cms: inner product never underestimates the true join size") {
    val ip = CmsInnerProduct(
      BoundReference(0, BinaryType, true), BoundReference(1, BinaryType, true))
    val agg = CmsAgg(BoundReference(0, LongType, true), 3, 64)
    check("cms-lower-bound", Prop.forAll(keys, keys) { (a, b) =>
      val est = ip.nullSafeEval(agg.serialize(cmsOf(a)), agg.serialize(cmsOf(b)))
        .asInstanceOf[Long]
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong)
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong)
      val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
      est >= exact
    })
  }

  // ---- CosineSim: interpreted eval matches the reference formula -----

  private val vec: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.choose(-4.0f, 4.0f)).map(_.toArray)

  test("cosine_sim: matches the double-accumulated reference formula") {
    val expr = CosineSim(
      BoundReference(0, ArrayType(FloatType), true),
      BoundReference(1, ArrayType(FloatType), true))
    check("cosine-ref", Prop.forAll(vec, vec) { (a, b) =>
      val got = expr.nullSafeEval(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any)))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0.0 || nb == 0.0) got == null
      else math.abs(got.asInstanceOf[Double] - dot / na / nb) < 1e-9
    })
  }

  // ---- RollingHash64: its own recurrence -----------------------------

  test("rolling_hash64: satisfies h(s :+ c) = 257*h(s) + byte(c) + 1") {
    val expr = RollingHash64(BoundReference(0, StringType, true))
    def h(text: String): Long =
      expr.nullSafeEval(UTF8String.fromString(text)).asInstanceOf[Long]
    // ASCII gen so one char == one byte (the recurrence is per BYTE)
    val s = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    check("rolling-recurrence",
      Prop.forAll(s, Gen.alphaNumChar) { (str, c) =>
        h(str + c) == 257L * h(str) + (c.toInt & 0xff) + 1L
      })
  }

  // ---- DdsAgg: the laws the quantile rollups rely on -----------------
  // agg23's map-side combine, agg24's window merge, and strm16's
  // cross-micro-batch state all reduce to: the serialized sketch is a
  // canonical pure function of the value MULTISET, and bucket-wise add
  // is a commutative monoid on that canonical form.

  private def ddsBuf(xs: Seq[Double]) = {
    val agg = DdsAgg(BoundReference(0, DoubleType, true))
    val buf = agg.createAggregationBuffer()
    xs.foreach(x => agg.update(buf, new GenericInternalRow(Array[Any](x))))
    buf
  }
  private def ddsBytes(xs: Seq[Double]): Seq[Byte] = {
    val agg = DdsAgg(BoundReference(0, DoubleType, true))
    agg.serialize(ddsBuf(xs)).toSeq
  }

  // mixes magnitudes across 9 decades with zero/negative (zero-bucket) hits
  private val dvals: Gen[List[Double]] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(0.001, 1e6),
      1 -> Gen.oneOf(0.0, -3.5)))

  test("dds: part-sketch merge is byte-identical to the single pass, " +
      "both merge orders") {
    check("dds-merge", Prop.forAll(dvals, dvals) { (a, b) =>
      val agg = DdsAgg(BoundReference(0, DoubleType, true))
      val ab = agg.serialize(agg.merge(ddsBuf(a), ddsBuf(b))).toSeq
      val ba = agg.serialize(agg.merge(ddsBuf(b), ddsBuf(a))).toSeq
      ab == ddsBytes(a ++ b) && ba == ddsBytes(a ++ b)
    })
  }

  test("dds: merge is associative on canonical bytes") {
    check("dds-assoc", Prop.forAll(dvals, dvals, dvals) { (a, b, c) =>
      val agg = DdsAgg(BoundReference(0, DoubleType, true))
      val l = agg.serialize(
        agg.merge(agg.merge(ddsBuf(a), ddsBuf(b)), ddsBuf(c))).toSeq
      val r = agg.serialize(
        agg.merge(ddsBuf(a), agg.merge(ddsBuf(b), ddsBuf(c)))).toSeq
      l == r
    })
  }

  test("dds: sketch bytes are insertion-order-free (multiset function)") {
    check("dds-order", Prop.forAll(dvals, Gen.long) { (a, seed) =>
      ddsBytes(new scala.util.Random(seed).shuffle(a)) == ddsBytes(a)
    })
  }

  test("dds_merge_agg: re-aggregating part sketches == whole sketch, " +
      "empty parts are identity") {
    check("dds-reagg", Prop.forAll(dvals, dvals) { (a, b) =>
      val m = DdsMergeAgg(BoundReference(0, BinaryType, true))
      val buf = m.createAggregationBuffer()
      for (part <- Seq(a, Nil, b)) // the empty part must not perturb
        m.update(buf, new GenericInternalRow(
          Array[Any](ddsBytes(part).toArray)))
      m.eval(buf).asInstanceOf[Array[Byte]].toSeq == ddsBytes(a ++ b)
    })
  }

  // ---- SpaceSaving: merge preserves the per-key bounds ----------------

  private def ssBuf(keys: Seq[Long], k: Int): SpaceSaving.Buf = {
    val b = new SpaceSaving.Buf(k)
    keys.foreach(b.offer)
    b
  }

  test("space_saving: after an arbitrary two-way merge, " +
      "est >= true >= est - err and keys above 2N/k are present") {
    val keyG = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(0L, 5L),      // a few hot keys
      3 -> Gen.choose(0L, 30L),
      1 -> Gen.choose(0L, 200L)))   // a long tail
    check("ss-merge-bounds",
      Prop.forAll(keyG, keyG, Gen.choose(4, 16)) { (a, b, k) =>
        val buf = ssBuf(a, k)
        buf.absorb(ssBuf(b, k))
        val all = a ++ b
        val exact = all.groupBy(identity).view.mapValues(_.size.toLong)
        val n = all.size.toLong
        val bounds = buf.m.forall { case (kk, v) =>
          val t = exact.getOrElse(kk, 0L)
          v(0) >= t && v(0) - v(1) <= t
        }
        val present = exact.forall { case (kk, c) =>
          c <= 2 * n / k + 1 || buf.m.contains(kk)
        }
        bounds && present
      })
  }

  test("space_saving: serialization round-trips counters, errors, and k") {
    val keyG = Gen.listOf(Gen.choose(0L, 50L))
    check("ss-serde", Prop.forAll(keyG, Gen.choose(4, 16)) { (a, k) =>
      val b = ssBuf(a, k)
      val r = SpaceSaving.deserialize(SpaceSaving.serialize(b))
      r.k == b.k && r.m.size == b.m.size && b.m.forall { case (kk, v) =>
        val rv = r.m.getOrNull(kk); rv != null && rv.sameElements(v)
      }
    })
  }

  test("dds: quantile estimate is within alpha relative error of the " +
      "exact rank statistic (positive values)") {
    val pos: Gen[List[Double]] =
      Gen.nonEmptyListOf(Gen.choose(10.0, 1e6))
    val qGen = Gen.oneOf(0.0, 0.25, 0.5, 0.9, 0.95, 1.0)
    check("dds-alpha", Prop.forAll(pos, qGen) { (a, q) =>
      val est = DdSketch.quantileValue(ddsBytes(a).toArray, q).doubleValue
      val sorted = a.sorted
      // SAME integer rank arithmetic as DdSketch.quantileBucket — the
      // double product q·(n−1) can land one below the integer rank for
      // e.g. q=0.95, n−1 a multiple of 20, picking an adjacent order
      // statistic and flaking when neighbors differ by more than alpha
      val rank = (Math.round(q * 10000) * (a.size - 1L) / 10000L).toInt
      val exact = sorted(rank) // rank ⌊q·(n−1)⌋+1, 1-based → 0-indexed
      // α=1% value guarantee + 2 dp output rounding slack (values ≥ 10)
      math.abs(est - exact) / exact <= 0.01 + 0.001
    })
  }
}
