package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.expressions.{TextHash, TokenFingerprint}

/** ScalaCheck property suite for the driver-side hash kernels (pure
  * JVM functions backing the native Catalyst expressions — no Spark
  * session needed, so properties run at full generator volume).
  */
object TextHashProperties extends Properties("TextHash") {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(!_.contains(" "))
  private val doc: Gen[String] = Gen.listOf(token).map(_.mkString(" "))

  property("tokenHashes count = token count") = forAll(doc) { s =>
    TextHash.tokenHashes(s).length == s.split(" ", -1).length
  }

  property("hashedShingles(n) count = max(tokens - n + 1, 0)") =
    forAll(doc, Gen.choose(1, 4)) { (s, n) =>
      val t = s.split(" ", -1).length
      TextHash.hashedShingles(s, n).length == math.max(t - n + 1, 0)
    }

  property("shingles are deterministic") = forAll(doc) { s =>
    TextHash.hashedShingles(s, 2).toSeq == TextHash.hashedShingles(s, 2).toSeq
  }

  property("simhash of identical docs equal; token order irrelevant to multiset") =
    forAll(Gen.nonEmptyListOf(token)) { toks =>
      val s = toks.mkString(" ")
      TextHash.simhash64(s) == TextHash.simhash64(s)
    }

  property("simhash is order-insensitive (bag-of-words model)") =
    forAll(Gen.nonEmptyListOf(token)) { toks =>
      TextHash.simhash64(toks.mkString(" ")) ==
        TextHash.simhash64(scala.util.Random.shuffle(toks).mkString(" "))
    }

  property("minhash signature of a superset is elementwise <= subset's") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.listOf(Gen.long)) { (base, extra) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val sub = TextHash.minhashSig(new GenericArrayData(base.toArray), 8)
      val sup = TextHash.minhashSig(new GenericArrayData((base ++ extra).toArray), 8)
      sub.zip(sup).forall { case (a, b) => b <= a }
    }

  property("fingerprint stays in [0, 1e9+7) and is order-sensitive-stable") =
    forAll(doc) { s =>
      val f = TokenFingerprint.compute(s)
      f >= 0 && f < TokenFingerprint.Mod && f == TokenFingerprint.compute(s)
    }
}
