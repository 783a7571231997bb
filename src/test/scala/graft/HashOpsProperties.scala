package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.HashOps

/** Property checks for the native expression kernels — pure functions
  * over ArrayData, no Spark session needed.
  */
object HashOpsProperties extends Properties("HashOps") {

  private def strArr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s): AnyRef).toArray)

  private def longArr(xs: Seq[Long]): GenericArrayData =
    new GenericArrayData(xs.toArray)

  private val tokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("a", "b", "c")))

  property("bigramShingles matches the reference formulation") =
    forAll(tokens) { ts =>
      val got = HashOps.bigramShingles(strArr(ts))
      val expect = ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq.distinct
      got.numElements() == expect.size &&
        (0 until got.numElements()).forall(i => got.getUTF8String(i).toString == expect(i))
    }

  property("sortedIntersectCount == |set intersection| on distinct inputs") =
    forAll(Gen.listOf(Gen.chooseNum(-50L, 50L)), Gen.listOf(Gen.chooseNum(-50L, 50L))) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      HashOps.sortedIntersectCount(longArr(sa), longArr(sb)) ==
        sa.toSet.intersect(sb.toSet).size.toLong
    }

  property("sortedHashes is sorted, length-preserving, content-determined") =
    forAll(tokens) { ts =>
      val h = HashOps.sortedHashes(strArr(ts))
      val vals = (0 until h.numElements()).map(h.getLong)
      vals == vals.sorted &&
        vals.size == ts.size &&
        vals == {
          val h2 = HashOps.sortedHashes(strArr(ts))
          (0 until h2.numElements()).map(h2.getLong)
        }
    }

  property("simhash64 is order-invariant over token multisets") =
    forAll(tokens) { ts =>
      HashOps.simhash64(strArr(ts)) == HashOps.simhash64(strArr(scala.util.Random.shuffle(ts)))
    }

  property("identical sets share every minhash band; disjoint-ish sets rarely do") =
    forAll(tokens.suchThat(_.nonEmpty)) { ts =>
      val b1 = HashOps.minhashBands(strArr(ts), 64, 4)
      val b2 = HashOps.minhashBands(strArr(scala.util.Random.shuffle(ts)), 64, 4)
      (0 until 16).forall(i => b1.getLong(i) == b2.getLong(i))
    }

  property("dotProduct matches sequential fold") =
    forAll(Gen.listOf(Gen.chooseNum(-10.0, 10.0))) { xs =>
      val arr = new GenericArrayData(xs.toArray)
      val expect = xs.map(x => x * x).foldLeft(0.0)(_ + _)
      HashOps.dotProduct(arr, arr) == expect
    }

  property("jaccard-0.8 pairs always share min(k, ceil(0.8n)) prefix hashes (k-prefix soundness)") = {
    val gen = for {
      base <- Gen.listOfN(30, Gen.identifier.map(_.take(6))).map(_.distinct)
      if base.size >= 10
      drop <- Gen.chooseNum(0, base.size / 10) // <=10% edits keeps j >= 0.8
    } yield (base, base.drop(drop))
    forAll(gen) { case (a, b) =>
      val k = 4
      def prefix(s: Seq[String]): Set[Long] = {
        val h = HashOps.sortedHashes(strArr(s))
        val n = s.size
        val plen = n - (4 * n + 4) / 5 + k
        (0 until math.min(plen, n)).map(h.getLong).toSet
      }
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val uni = a.toSet.union(b.toSet).size.toDouble
      val j = if (uni == 0) 1.0 else inter / uni
      val need = math.min(k, math.min(math.ceil(0.8 * a.size), math.ceil(0.8 * b.size))).toInt
      Prop.collect(f"j=$j%.2f") {
        j < 0.8 || prefix(a).intersect(prefix(b)).size >= need
      }
    }
  }

  private def u8(s: String) = UTF8String.fromString(s)
  private val shortStr: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
      .map(_.mkString)

  property("jaroWinkler stays in [0,1]; 1 iff equal non-empty; empty → 0") =
    forAll(shortStr, shortStr) { (a, b) =>
      val s = HashOps.jaroWinkler(u8(a), u8(b))
      val inRange = s >= 0.0 && s <= 1.0
      val oneIffEq =
        if (a.nonEmpty && a == b) s == 1.0
        else if (a.isEmpty || b.isEmpty) s == 0.0
        else (s == 1.0) == (a == b)
      inRange && oneIffEq
    }

  property("jaroWinkler is symmetric (matches the DuckDB convention)") =
    forAll(shortStr, shortStr) { (a, b) =>
      HashOps.jaroWinkler(u8(a), u8(b)) == HashOps.jaroWinkler(u8(b), u8(a))
    }

  property("damerauLevenshtein: symmetric, <= levenshtein, identity-zero") =
    forAll(shortStr, shortStr) { (a, b) =>
      def lev(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      val dl = HashOps.damerauLevenshtein(u8(a), u8(b))
      dl == HashOps.damerauLevenshtein(u8(b), u8(a)) &&
        dl <= lev(a, b) &&
        dl >= math.abs(a.length - b.length) &&
        (HashOps.damerauLevenshtein(u8(a), u8(a)) == 0L)
    }

  // Both metrics iterate Unicode code points, not UTF-16 code units:
  // replacing each non-BMP character with a distinct BMP one (a code
  // point bijection) must leave the scores untouched — under code-unit
  // iteration a surrogate-pair swap would cost 2 and break dl <= lev.
  private val emojiStr: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("😀", "🎉", "🚀", "a")))
      .map(_.mkString)
  private def toBmp(s: String): String =
    s.replace("😀", "q").replace("🎉", "z")
      .replace("🚀", "w")

  // the thresholded kernel's early rejections must never change the
  // decision the exact score comparison makes — sweep random strings
  // against thresholds dense around the score range (incl. >1 and <0)
  property("jaroWinklerGte decides exactly like jaroWinkler-then-compare") =
    forAll(shortStr, shortStr, Gen.chooseNum(-0.05, 1.05)) { (a, b, t) =>
      val s = HashOps.jaroWinkler(u8(a), u8(b))
      HashOps.jaroWinklerGte(u8(a), u8(b), t, strict = false) == (s >= t) &&
        HashOps.jaroWinklerGte(u8(a), u8(b), t, strict = true) == (s > t) &&
        // the exact score used as threshold hits both boundary branches
        HashOps.jaroWinklerGte(u8(a), u8(b), s, strict = false) &&
        !HashOps.jaroWinklerGte(u8(a), u8(b), s, strict = true)
    }

  property("jaroWinkler and damerauLevenshtein score code points, not code units") =
    forAll(emojiStr, emojiStr) { (a, b) =>
      HashOps.jaroWinkler(u8(a), u8(b)) ==
        HashOps.jaroWinkler(u8(toBmp(a)), u8(toBmp(b))) &&
      HashOps.damerauLevenshtein(u8(a), u8(b)) ==
        HashOps.damerauLevenshtein(u8(toBmp(a)), u8(toBmp(b)))
    }

  // r21 kernels: each must equal the HOF/SQL formulation it replaced,
  // value for value — that identity is what keeps the oracle hashes of
  // every consumer unchanged.

  property("md5MinhashSig == per-permutation min of hex(md5(\"j:\" || s))") =
    forAll(tokens) { ts =>
      val n = 16
      val got = HashOps.md5MinhashSig(strArr(ts), n)
      if (ts.isEmpty) got == null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
        val expect = (0 until n).map(j =>
          ts.map(s => hex(md.digest(s"$j:$s".getBytes("UTF-8")))).min)
        got.numElements() == n &&
          (0 until n).forall(j => got.getUTF8String(j).toString == expect(j))
      }
    }

  property("md5Simhash56 == sign of per-bit votes over 56-bit md5-prefix token hashes") =
    forAll(tokens) { ts =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](56)
      ts.foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        val hex = d.map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
        (0 until 56).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      val expect = (0 until 56).map(b => if (votes(b) > 0) 1L << b else 0L).sum
      HashOps.md5Simhash56(strArr(ts)) == expect
    }

  property("poissonBootWeights == the md5-u CDF-case draw per replicate") =
    forAll(Gen.chooseNum(-5L, 99999L), Gen.chooseNum(0L, 7L)) { (a, b) =>
      val cdf = Array(367879L, 735758L, 919698L, 980947L, 996259L, 999999L)
      val reps = 8
      val prefixes = Array.tabulate(reps)(r => s"boot:$r".getBytes("UTF-8"))
      val md = java.security.MessageDigest.getInstance("MD5")
      val got = HashOps.poissonBootWeights(a, b, prefixes, cdf)
      (0 until reps).forall { r =>
        val hex = md.digest(s"boot:$r:$a:$b".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1000000L
        val w = cdf.indexWhere(u < _) match { case -1 => cdf.length; case k => k }
        got.getLong(r) == w.toLong
      }
    }

  property("md5BigramFeatCounts == group-count of the 2-char-window md5 feature draw") =
    forAll(Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'ü', '語'))).map(_.mkString)) { s =>
      val buckets = 64
      val md = java.security.MessageDigest.getInstance("MD5")
      val cps = s.toSeq // test alphabet is BMP-only, so chars == code points
      val expect = cps.sliding(2).filter(_.size == 2).toSeq
        .map { w =>
          val hex = md.digest(w.mkString.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.substring(0, 7), 16) % buckets
        }
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val got = HashOps.md5BigramFeatCounts(u8(s), buckets)
      got.numElements() == expect.size && expect.indices.forall { i =>
        val row = got.getStruct(i, 2)
        row.getLong(0) == expect(i)._1 && row.getLong(1) == expect(i)._2
      }
    }

  private val intVec: Gen[Array[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-127, 127)).map(_.map(_.toDouble).toArray)

  property("pqEncode == first-argmin of (c·c − 2·x·c) per subspace") =
    forAll(Gen.listOfN(5, intVec), intVec) { (cents, q) =>
      val m = 4
      val dim = 16
      val dsub = dim / m
      val k = cents.size
      val flat = cents.flatten.toArray
      val selfs = Array.tabulate(k * m) { i =>
        val (c, ms) = (i / m, i % m)
        (0 until dsub).map(j => { val x = cents(c)(ms * dsub + j); x * x }).sum
      }
      val got = HashOps.pqEncode(new GenericArrayData(q), flat, selfs, m, dsub, k)
      (0 until m).forall { ms =>
        val ds = (0 until k).map { c =>
          val d = (0 until dsub).map(j => q(ms * dsub + j) * cents(c)(ms * dsub + j)).sum
          selfs(c * m + ms) - 2.0 * d
        }
        got.getLong(ms) == ds.indexOf(ds.min) + 1
      }
    }

  property("pqLut == (optional self-term) + partial distances, laid out ms·k + c") =
    forAll(Gen.listOfN(3, intVec), intVec, Gen.oneOf(true, false)) { (cents, q, addSelf) =>
      val m = 4
      val dim = 16
      val dsub = dim / m
      val k = cents.size
      val flat = cents.flatten.toArray
      val selfs = Array.tabulate(k * m) { i =>
        val (c, ms) = (i / m, i % m)
        (0 until dsub).map(j => { val x = cents(c)(ms * dsub + j); x * x }).sum
      }
      val got = HashOps.pqLut(new GenericArrayData(q), flat, selfs, m, dsub, k, addSelf)
      (0 until m).forall { ms =>
        val rr = if (addSelf)
          (0 until dsub).map(j => { val x = q(ms * dsub + j); x * x }).sum else 0.0
        (0 until k).forall { c =>
          val d = (0 until dsub).map(j => q(ms * dsub + j) * cents(c)(ms * dsub + j)).sum
          got.getDouble(ms * k + c) == rr + (selfs(c * m + ms) - 2.0 * d)
        }
      }
    }
}
