package graft.ops

import graft.functions.HashKernels

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.ArrayData

/** Property layer over the round-3 kernels — randomized invariants the
  * example-based specs can't sweep. (Plain ScalaCheck Gen sampled
  * deterministically, same pattern as ParseProperties.)
  */
class KernelProperties extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var executed = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach { a =>
          executed += 1
          try f(a) catch {
            case e: Throwable => fail(s"failed for sample #$i: $a — ${e.getMessage}")
          }
        }
    }
    assert(executed >= n / 2, s"only $executed/$n samples generated — property is vacuous")
  }

  test("property: hilbertIndex is a bijection onto [0, 4^bits) for bits in 1..6") {
    forAllN(Gen.chooseNum(1, 6), n = 6) { bits =>
      val side = 1 << bits
      val seen = new Array[Boolean](side * side)
      for (x <- 0 until side; y <- 0 until side) {
        val d = HashKernels.hilbertIndex(bits, x, y)
        assert(d >= 0 && d < side.toLong * side, s"($x,$y) -> $d out of range at bits=$bits")
        assert(!seen(d.toInt), s"collision at d=$d for ($x,$y), bits=$bits")
        seen(d.toInt) = true
      }
    }
  }

  test("property: norm2sq(a) is bitwise-identical to dot(a, a) on random arrays") {
    val arrGen = for {
      n <- Gen.chooseNum(0, 64)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(_ * 1.7243))
    } yield xs.toArray
    forAllN(arrGen) { xs =>
      val ad = ArrayData.toArrayData(xs)
      assert(java.lang.Double.doubleToRawLongBits(HashKernels.norm2sq(ad)) ==
        java.lang.Double.doubleToRawLongBits(HashKernels.dot(ad, ad)))
    }
  }

  test("property: allocateBlocks always yields equal-size blocks, each eigenvalue placed once") {
    val valsGen = for {
      m <- Gen.oneOf(2, 4, 8)
      sub <- Gen.chooseNum(1, 8)
      vals <- Gen.listOfN(m * sub, Gen.chooseNum(1e-6, 1e4))
    } yield (vals.toArray, m)
    forAllN(valsGen) { case (vals, m) =>
      val slots = OpqOps.allocateBlocks(vals, m)
      assert(slots.sorted.toSeq == vals.indices.toSeq, "each eigenvector placed exactly once")
      val sub = vals.length / m
      // block fill counts are uniform by construction (level-by-level);
      // additionally the m largest eigenvalues must sit in m distinct blocks
      val blockOf = slots.zipWithIndex.map { case (e, pos) => e -> pos / sub }.toMap
      val top = vals.indices.sortBy(i => -vals(i)).take(m)
      assert(top.map(blockOf).toSet.size == m,
        s"top-$m eigenvalues must spread over $m blocks")
    }
  }

  test("property: hilbertIndexN is a bijection onto [0, 2^(d*bits)) for d in 2..4") {
    for ((d, bits) <- Seq((2, 3), (3, 2), (3, 3), (4, 2))) {
      val side = 1 << bits
      val total = 1L << (d * bits)
      val seen = new Array[Boolean](total.toInt)
      def walk(prefix: List[Int]): Unit =
        if (prefix.length == d) {
          val h = HashKernels.hilbertIndexN(
            bits, ArrayData.toArrayData(prefix.toArray))
          assert(h >= 0 && h < total, s"$prefix -> $h out of range (d=$d bits=$bits)")
          assert(!seen(h.toInt), s"collision at $h for $prefix (d=$d bits=$bits)")
          seen(h.toInt) = true
        } else (0 until side).foreach(c => walk(prefix :+ c))
      walk(Nil)
    }
  }

  test("property: hilbertIndexN consecutive indexes step ONE coordinate by exactly 1") {
    for ((d, bits) <- Seq((2, 4), (3, 3), (4, 2))) {
      val side = 1 << bits
      val total = 1L << (d * bits)
      // invert by exhaustive walk: index -> coords
      val inv = new Array[Array[Int]](total.toInt)
      def walk(prefix: List[Int]): Unit =
        if (prefix.length == d) {
          val c = prefix.toArray
          inv(HashKernels.hilbertIndexN(bits, ArrayData.toArrayData(c)).toInt) = c
        } else (0 until side).foreach(c => walk(prefix :+ c))
      walk(Nil)
      (1 until total.toInt).foreach { h =>
        val diffs = inv(h).zip(inv(h - 1)).map { case (a, b) => math.abs(a - b) }
        assert(diffs.sum == 1 && diffs.max == 1,
          s"d=$d bits=$bits: step $h moves ${diffs.mkString(",")} (${inv(h - 1).mkString(",")} -> ${inv(h).mkString(",")})")
      }
    }
  }

  test("property: windowHashes rolling slide equals an independent BigInt polynomial per window") {
    // independent oracle: the same Karp–Rabin definition computed
    // from scratch per window in BigInt arithmetic (no shared modular
    // helpers — a slide/carry bug in the O(n) kernel cannot hide).
    // The base/modulus constants are pinned on purpose: changing the
    // kernel's key family must be a visible, deliberate act.
    val m61 = (BigInt(1) << 61) - 1
    val base = BigInt(0x2545F4914F6CDD1DL & ((1L << 61) - 1))
    val cpGen = Gen.frequency(
      6 -> Gen.chooseNum('a'.toInt, 'z'.toInt),
      2 -> Gen.oneOf('é'.toInt, 'α'.toInt, '日'.toInt), // 2- and 3-byte UTF-8
      1 -> Gen.chooseNum(0x10000, 0x10FFF)) // supplementary plane (4-byte, surrogate pair)
    val caseGen = for {
      n <- Gen.chooseNum(0, 60)
      cps <- Gen.listOfN(n, cpGen)
      l <- Gen.chooseNum(1, 10)
    } yield (cps, l)
    forAllN(caseGen) { case (cps, l) =>
      val s = new String(cps.flatMap(cp => Character.toChars(cp).toList).toArray)
      val got = HashKernels.windowHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), l)
      val m = math.max(0, cps.length - l + 1)
      assert(got.numElements() == m, s"window count for n=${cps.length}, L=$l")
      var i = 0
      while (i < m) {
        val want = cps.slice(i, i + l)
          .foldLeft(BigInt(0))((acc, cp) => (acc * base + cp) mod m61)
        assert(BigInt(got.getLong(i)) == want,
          s"window $i (of $m) disagrees for L=$l, cps=${cps.mkString(",")}")
        i += 1
      }
    }
  }

  test("property: dot is symmetric and norm2sq is non-negative") {
    val pairGen = for {
      n <- Gen.chooseNum(1, 32)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
      ys <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
    } yield (xs.toArray, ys.toArray)
    forAllN(pairGen) { case (xs, ys) =>
      val (a, b) = (ArrayData.toArrayData(xs), ArrayData.toArrayData(ys))
      assert(HashKernels.dot(a, b) == HashKernels.dot(b, a), "dot symmetric")
      assert(HashKernels.norm2sq(a) >= 0.0)
    }
  }
}
