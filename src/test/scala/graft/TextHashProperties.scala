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

  // ---- code-point granularity (the astral-plane seam) ----
  // The DuckDB twins fold per CODE POINT (unicode(c) / regex `(.)`);
  // an astral char is one code point but TWO Java chars, so any
  // per-charAt kernel silently diverges exactly on emoji-bearing text.

  private val anyChar: Gen[String] = Gen.oneOf(
    Gen.alphaLowerChar.map(_.toString),
    Gen.oneOf("東", "ß", "я", "ü").map(_.toString),
    Gen.oneOf("🚀", "😀", "𝄞", "🧪").map(_.toString)) // astral (2 Java chars)
  private val astralToken: Gen[String] =
    Gen.nonEmptyListOf(anyChar).map(_.mkString)

  property("token hash folds per code point, not per UTF-16 unit") =
    forAll(astralToken) { w =>
      // reference fold straight over the code-point stream
      var h = TextHash.FnvOffset
      w.codePoints().forEach { cp => h ^= cp.toLong; h *= TextHash.FnvPrime }
      TextHash.tokenHashes(w).toSeq == Seq(h)
    }

  property("simhash of astral text is stable and code-point-determined") =
    forAll(Gen.nonEmptyListOf(astralToken)) { toks =>
      val s = toks.mkString(" ")
      // a UTF-16 twin that differs only in surrogate pairing cannot
      // exist for a well-formed string; determinism + the per-token
      // fold property above pin the granularity
      TextHash.simhash64(s) == TextHash.simhash64(s) &&
        TextHash.tokenHashes(s).length == s.split(" ", -1).length
    }

  property("BPE seed symbols are code points: n_bpe <= code-point length") =
    forAll(astralToken) { w =>
      val empty = new java.util.HashMap[String, Integer]()
      val n = graft.functions.Bpe.wordTokens(w, empty)
      n == w.codePointCount(0, w.length)
    }
}
