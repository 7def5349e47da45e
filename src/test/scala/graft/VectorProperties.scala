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
}
