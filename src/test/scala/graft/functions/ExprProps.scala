package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based laws for the native expressions' static kernels —
  * pure JVM, no Spark session per case (CodecProps pattern). The
  * DataFrame-level behavior is covered by the specs; these pin the
  * arithmetic contracts the oracle SQL depends on.
  */
object ExprProps extends Properties("functions") {

  private val genToken: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genToks: Gen[Array[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genToken).map(_.toArray))

  private def toArrayData(toks: Array[String]): GenericArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))

  property("ShingleHashes output is strictly increasing (sorted + distinct)") =
    Prop.forAll(genToks) { toks =>
      val out = ShingleHashes.compute(toArrayData(toks), 3).toLongArray()
      out.zip(out.drop(1)).forall { case (a, b) => a < b }
    }

  property("ShingleHashes size equals the number of distinct 3-token windows") =
    Prop.forAll(genToks) { toks =>
      val out = ShingleHashes.compute(toArrayData(toks), 3).numElements()
      val expected = toks.sliding(3).filter(_.length == 3).map(_.toSeq).toSet.size
      // modulo astronomically-unlikely 64-bit collisions
      out == expected
    }

  property("ShingleHashes preserves token boundaries (no concat ambiguity)") =
    Prop.forAll(genToken, genToken, genToken) { (a, b, c) =>
      // ("ab","c") vs ("a","bc"): same concatenation, different tokens —
      // chained per-token hashing must separate them
      val h1 = ShingleHashes.compute(toArrayData(Array(a + b, c, c)), 3).getLong(0)
      val h2 = ShingleHashes.compute(toArrayData(Array(a, b + c, c)), 3).getLong(0)
      h1 != h2
    }

  private val genVec: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0f, 100.0f)).map(_.toArray))

  private def cosq(a: Array[Float], b: Array[Float]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val t = ArrayType(FloatType, containsNull = false)
    QuantizedCosine(Literal(new GenericArrayData(a), t), Literal(new GenericArrayData(b), t))
      .eval(null).asInstanceOf[Long]
  }

  property("QuantizedCosine is symmetric") =
    Prop.forAll(genVec, genVec) { (a, b) =>
      cosq(a, b) == cosq(b, a)
    }

  property("QuantizedCosine is bounded by the quantized unit interval") =
    Prop.forAll(genVec, genVec) { (a, b) =>
      // Cauchy-Schwarz holds exactly on the int64 components; sqrt
      // rounding can push the ratio one ulp past ±1, hence the -10001
      val c = cosq(a, b)
      c >= -10001L && c <= 10000L
    }

  property("QuantizedCosine of a vector with itself is ~1 (unless zero-quantized)") =
    Prop.forAll(genVec) { a =>
      val c = cosq(a, a)
      c == 0L || c >= 9999L
    }

  private val genCentroids: Gen[Array[Array[Double]]] =
    Gen.choose(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.listOfN(4, Gen.choose(-10.0, 10.0)).map(_.toArray)).map(_.toArray))

  private val genVec4: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.choose(-10.0f, 10.0f)).map(_.toArray)

  property("NearestCell returns the reference argmin with lower-index ties") =
    Prop.forAll(genVec4, genCentroids) { (v, cs) =>
      val got = NearestCell.compute(new GenericArrayData(v), cs)
      val dists = cs.map(_.zip(v.map(_.toDouble)).map { case (c, x) => (x - c) * (x - c) }.sum)
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      got == best
    }

  private val genLongs: Gen[Array[Long]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L)).map(_.toArray))

  property("PairExpand emits exactly the n(n-1)/2 ordered combinations in order") =
    Prop.forAll(genLongs) { xs =>
      val out = PairExpand.compute(new GenericArrayData(xs.map(x => x: Any)))
      val expected = for {
        i <- xs.indices
        j <- i + 1 until xs.length
      } yield (xs(i), xs(j))
      out.numElements() == expected.size && expected.indices.forall { k =>
        val row = out.getStruct(k, 2)
        (row.getLong(0), row.getLong(1)) == expected(k)
      }
    }

  property("MinHashSig is bit-identical to the per-seed xxhash64 min fold") =
    Prop.forAll(genLongs.suchThat(_.nonEmpty), Gen.choose(1, 16), Gen.choose(-50L, 50L)) {
      (hs, k, seed) =>
        import org.apache.spark.sql.catalyst.expressions.XXH64
        val got = MinHashSig.compute(
          new GenericArrayData(hs.map(x => x: Any)), k, seed).toLongArray()
        // reference: Spark's two-arg xxhash64(seed + i, x) semantics —
        // chain both longs from the fixed SQL seed 42
        val expected = Array.tabulate(k) { i =>
          hs.map(x => XXH64.hashLong(x, XXH64.hashLong(seed + i, 42L))).min
        }
        got.sameElements(expected)
    }

  property("MinHashSig min is monotone under set union (signature of A∪B ≤ both)") =
    Prop.forAll(genLongs.suchThat(_.nonEmpty), genLongs.suchThat(_.nonEmpty)) { (a, b) =>
      val k = 8
      def sig(xs: Array[Long]) =
        MinHashSig.compute(new GenericArrayData(xs.map(x => x: Any)), k, 42L).toLongArray()
      val su = sig(a ++ b); val sa = sig(a); val sb = sig(b)
      (0 until k).forall(i => su(i) == math.min(sa(i), sb(i)))
    }

  // ---- WinnowFps: the kernel must equal the textbook definition ----

  private def winnowRef(toks: Array[String], w: Int, win: Int): Seq[Seq[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = toks.sliding(w).filter(_.length == w)
      .map(sh => md.digest(sh.mkString(" ").getBytes("UTF-8")).toSeq).toArray
    def lt(a: Seq[Byte], b: Seq[Byte]): Boolean = {
      val it = a.zip(b).iterator
      while (it.hasNext) {
        val (x, y) = it.next()
        val c = java.lang.Integer.compare(x & 0xff, y & 0xff)
        if (c != 0) return c < 0
      }
      a.length < b.length
    }
    digests.indices
      .map(i => digests.slice(i, math.min(i + win, digests.length)).reduceLeft(
        (a, b) => if (lt(b, a)) b else a))
      .distinct.sortWith(lt)
  }

  property("WinnowFps equals the textbook window-min over md5 digests") =
    Prop.forAll(genToks, Gen.choose(1, 6)) { (toks, win) =>
      val got = WinnowFps.compute(toArrayData(toks), 3, win)
      val gotSeq = (0 until got.numElements()).map(i => got.getBinary(i).toSeq)
      gotSeq == winnowRef(toks, 3, win)
    }

  property("CosineSimilarity returns 0.0 (never NaN) for a zero-norm input") =
    Prop.forAll(genVec) { v =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val t = ArrayType(FloatType, containsNull = false)
      val zero = Array.fill(v.length)(0.0f)
      val got = CosineSimilarity(
        Literal(new GenericArrayData(zero), t),
        Literal(new GenericArrayData(v), t)).eval(null).asInstanceOf[Double]
      got == 0.0d
    }

  property("PairExpand fails loudly past the pair cap instead of overflowing Int") =
    Prop.forAll(Gen.const(20000)) { n =>
      // n(n-1)/2 ≈ 2e8 > 2^26 cap; without the Long guard, n >= 65537
      // wraps Int and throws NegativeArraySizeException instead
      val xs = new GenericArrayData(Array.tabulate(n)(i => i.toLong: Any))
      Prop.throws(classOf[IllegalStateException])(PairExpand.compute(xs))
    }

  property("WinnowFps is position-robust: a prefix shift keeps most fingerprints") =
    Prop.forAll(genToks.suchThat(_.length >= 10), genToken) { (toks, extra) =>
      def fps(ts: Array[String]) = {
        val out = WinnowFps.compute(toArrayData(ts), 3, 4)
        (0 until out.numElements()).map(i => out.getBinary(i).toSeq).toSet
      }
      val base = fps(toks)
      val shifted = fps(extra +: toks)
      (base intersect shifted).size * 2 >= base.size
    }
}
