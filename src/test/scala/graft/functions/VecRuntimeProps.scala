package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the native vector kernels ([[VecRuntime]])
  * against independent plain-Scala references — these kernels sit in
  * every ANN pair loop and every k-means/PQ iteration, so their
  * arithmetic contracts (left-to-right double accumulation, float
  * widening BEFORE arithmetic, floor(x·s + 0.5) quantization,
  * lowest-ordinal tie-breaks, (j·k + c)-ordered LUT layout) are
  * load-bearing for every oracle-checked result downstream.
  */
object VecRuntimeProps extends Properties("VecRuntime") {

  private val dim = Gen.choose(1, 24)
  private def vecGen(n: Int): Gen[List[Double]] =
    Gen.listOfN(n, Gen.choose(-10.0, 10.0))
  private val pairGen = for {
    n <- dim; a <- vecGen(n); b <- vecGen(n)
  } yield (a, b)

  private def d(a: Seq[Double]) = UnsafeArrayData.fromPrimitiveArray(a.toArray)
  private def f(a: Seq[Double]) = UnsafeArrayData.fromPrimitiveArray(a.map(_.toFloat).toArray)

  property("dotDD = left-to-right fold") = forAll(pairGen) { case (a, b) =>
    val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    VecRuntime.dotDD(d(a), d(b)) == ref
  }

  property("dotFF widens floats to double BEFORE multiplying") =
    forAll(pairGen) { case (a, b) =>
      val ref = a.map(_.toFloat).zip(b.map(_.toFloat))
        .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      VecRuntime.dotFF(f(a), f(b)) == ref
    }

  property("dotDF(a, b) = dotFD(b, a)") = forAll(pairGen) { case (a, b) =>
    VecRuntime.dotDF(d(a), f(b)) == VecRuntime.dotFD(f(b), d(a))
  }

  property("fixedPointD = floor(x*scale + 0.5) per element") =
    forAll(pairGen, Gen.oneOf(1.0, 100.0, 1000.0)) { case ((a, _), scale) =>
      val got = VecRuntime.fixedPointD(d(a), scale)
      a.indices.forall { i =>
        got.getLong(i) == math.floor(a(i) * scale + 0.5).toLong
      }
    }

  property("quantizeD: scale = 127/max|x| (0 on zero vector), q = floor(x*scale + 0.5)") =
    forAll(pairGen) { case ((a, _)) =>
      val row = VecRuntime.quantizeD(d(a))
      val qv = row.getArray(0)
      val scale = row.getDouble(1)
      val mx = a.map(math.abs).foldLeft(0.0)(math.max)
      val refScale = if (mx > 0.0) 127.0 / mx else 0.0
      scale == refScale && a.indices.forall { i =>
        qv.getInt(i) == math.floor(a(i) * refScale + 0.5).toInt
      }
    }

  // PQ: m subspaces of width dsub, k centroids each; codebook rides as
  // m·k·dsub flat longs ((j·k + c)·dsub + i), codes as m ints
  private val pqGen = for {
    m <- Gen.choose(1, 4)
    k <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 3)
    q <- Gen.listOfN(m * dsub, Gen.choose(-1000L, 1000L))
    cents <- Gen.listOfN(m * k * dsub, Gen.choose(-1000L, 1000L))
    codes <- Gen.listOfN(m, Gen.choose(0, k - 1))
  } yield (m, k, dsub, q, cents, codes)

  private def refAdc(m: Int, k: Int, dsub: Int,
      q: List[Long], cents: List[Long], codes: List[Int]): Long =
    (0 until m).map { j =>
      val c = codes(j)
      (0 until dsub).map { i =>
        val t = q(j * dsub + i) - cents((j * k + c) * dsub + i); t * t
      }.sum
    }.sum

  property("pqAdc(codes, pqLut(q)) = sum of per-subspace squared-L2 to the coded centroid") =
    forAll(pqGen) { case (m, k, dsub, q, cents, codes) =>
      val lut = VecRuntime.pqLut(
        UnsafeArrayData.fromPrimitiveArray(q.toArray),
        UnsafeArrayData.fromPrimitiveArray(cents.toArray), m)
      val got = VecRuntime.pqAdc(
        UnsafeArrayData.fromPrimitiveArray(codes.toArray), lut)
      got == refAdc(m, k, dsub, q, cents, codes)
    }

  property("nearestCentroid = argmin squared-L2, ties to the LOWEST ordinal") =
    forAll(for {
      dsub <- Gen.choose(1, 4)
      k <- Gen.choose(1, 5)
      v <- Gen.listOfN(dsub, Gen.choose(-5L, 5L)) // small range forces ties
      cents <- Gen.listOfN(k * dsub, Gen.choose(-5L, 5L))
    } yield (dsub, k, v, cents)) { case (dsub, k, v, cents) =>
      val row = VecRuntime.nearestCentroid(
        UnsafeArrayData.fromPrimitiveArray(v.toArray),
        UnsafeArrayData.fromPrimitiveArray(cents.toArray))
      val dists = (0 until k).map { j =>
        (0 until dsub).map { i => val t = v(i) - cents(j * dsub + i); t * t }.sum
      }
      val refBest = dists.zipWithIndex.minBy { case (dist, j) => (dist, j) }
      row.getInt(0) == refBest._2 && row.getLong(1) == refBest._1
    }
}
