package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.expressions.VectorKernels

/** ScalaCheck properties for the native vector kernels (pure JVM —
  * no Spark session, full generator volume).
  */
object VectorProperties extends Properties("VectorKernels") {

  private val floats: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10f, 10f)).map(_.toArray)

  private def arr(a: Array[Float]) = new GenericArrayData(a.map(x => x: Any))
  private def arrL(a: Array[Long]) = new GenericArrayData(a.map(x => x: Any))

  property("dot equals the naive left-to-right reference") =
    forAll(floats, floats) { (a, b) =>
      var acc = 0.0
      for (i <- a.indices) acc += a(i).toDouble * b(i).toDouble
      VectorKernels.dotFF(arr(a), arr(b)) == acc
    }

  property("dot is bit-exactly commutative") =
    forAll(floats, floats) { (a, b) =>
      VectorKernels.dotFF(arr(a), arr(b)) == VectorKernels.dotFF(arr(b), arr(a))
    }

  property("dot of mismatched lengths is null") =
    forAll(floats) { a =>
      a.isEmpty || VectorKernels.dotFF(arr(a), arr(a.drop(1))) == null
    }

  property("dot with a null element is null") =
    forAll(floats, Gen.choose(0, 15)) { (a, i) =>
      val withNull = new GenericArrayData(a.indices.map(j =>
        if (j == i) null else (a(j): Any)).toArray)
      VectorKernels.dotFF(arr(a), withNull) == null
    }

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted.toArray)

  property("sortedIntersectCount equals Set intersection size") =
    forAll(sortedLongs, sortedLongs) { (a, b) =>
      VectorKernels.sortedIntersectCount(arrL(a), arrL(b)) ==
        a.toSet.intersect(b.toSet).size
    }

  property("sortedIntersectCount is symmetric and bounded") =
    forAll(sortedLongs, sortedLongs) { (a, b) =>
      val ab = VectorKernels.sortedIntersectCount(arrL(a), arrL(b))
      val ba = VectorKernels.sortedIntersectCount(arrL(b), arrL(a))
      ab == ba && ab <= math.min(a.length, b.length)
    }

  property("self-intersection is the full set") =
    forAll(sortedLongs) { a =>
      VectorKernels.sortedIntersectCount(arrL(a), arrL(a)) == a.length
    }

  // -- k-means argmin kernels ------------------------------------------

  private val qvec: Gen[Array[Long]] =
    Gen.listOfN(6, Gen.chooseNum(-10000L, 10000L)).map(_.toArray)

  private val centMatrix: Gen[Array[Array[Long]]] =
    Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, qvec).map(_.toArray))

  private def naiveArgmin(q: Array[Long], cents: Array[Array[Long]],
                          labels: Array[Long]): (Long, Long) =
    cents.zip(labels).map { case (c, l) =>
      (c.zip(q).map { case (x, y) => (y - x) * (y - x) }.sum, l)
    }.min

  property("kmeansArgmin equals the naive lexicographic (dist, label) min, " +
      "including duplicate centroids under distinct labels") =
    forAll(qvec, centMatrix) { (q, cents) =>
      // duplicate the first centroid under a LARGER label so the
      // smaller-label tie-break is exercised on every sample
      val cs = cents :+ cents.head
      val labels = cs.indices.map(_.toLong).toArray
      val got = VectorKernels.kmeansArgmin(arrL(q), cs, labels)
      got.getLong(0) == naiveArgmin(q, cs, labels)._2 &&
        got.getLong(1) == naiveArgmin(q, cs, labels)._1
    }

  property("kmeansArgmin nulls on dimension mismatch and null elements") =
    forAll(qvec, centMatrix) { (q, cents) =>
      val labels = cents.indices.map(_.toLong).toArray
      val short = cents.map(_.drop(1))
      val withNull = new GenericArrayData(
        q.indices.map(j => if (j == 0) null else (q(j): Any)).toArray)
      VectorKernels.kmeansArgmin(arrL(q), short, labels) == null &&
        VectorKernels.kmeansArgmin(withNull, cents, labels) == null
    }

  property("kmeansArgmin2l dispatches to the cell's slice exactly and " +
      "nulls out-of-range or empty cells") =
    forAll(qvec, Gen.listOfN(4, centMatrix)) { (q, cellCents) =>
      val cents = cellCents.toArray :+ Array.empty[Array[Long]]
      val labels = cents.map(_.indices.map(_.toLong).toArray)
      (0 until 4).forall { cell =>
        val got = VectorKernels.kmeansArgmin2l(cell.toLong, arrL(q), cents, labels)
        val want = naiveArgmin(q, cents(cell), labels(cell))
        got.getLong(0) == want._2 && got.getLong(1) == want._1
      } &&
        VectorKernels.kmeansArgmin2l(4L, arrL(q), cents, labels) == null &&
        VectorKernels.kmeansArgmin2l(-1L, arrL(q), cents, labels) == null &&
        VectorKernels.kmeansArgmin2l(5L, arrL(q), cents, labels) == null
    }
}
