package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text-hash kernels for the dedup operators.
  *
  * Spark's higher-order functions (transform/aggregate) are interpreted
  * per element — measured as the dominant cost of shingling/minhash/
  * simhash over the fixtures. Each expression here is one tight Java
  * pass over the raw string / long array.
  *
  * Hash construction: FNV-1a 64 per token, Murmur3 fmix64 avalanche for
  * combining — any well-mixed injective-ish hash gives identical
  * Jaccard/minhash SEMANTICS (set sizes and min statistics), so these
  * do not need to reproduce xxhash64 bit-for-bit.
  */
object TextHash {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  @inline def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** FNV-1a 64 over the CODE POINTS of a char range of s — not UTF-16
    * units: the DuckDB oracle twin folds `unicode(c)` per code point,
    * and an astral-plane char (emoji, U+10000+) is one code point but
    * two Java chars, so a per-charAt fold would diverge exactly there.
    * BMP text is unaffected (charCount = 1). A surrogate pair never
    * straddles a token boundary (the delimiter ' ' is BMP), so
    * codePointAt inside [from, until) is always whole.
    */
  @inline private def tokenHash(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h ^= cp.toLong
      h *= FnvPrime
      i += Character.charCount(cp)
    }
    h
  }

  /** Per-token FNV hashes of the single-space-separated tokens. */
  def tokenHashes(s: String): Array[Long] = {
    val out = Array.newBuilder[Long]
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        out += tokenHash(s, start, i)
        start = i + 1
      }
      i += 1
    }
    out.result()
  }

  /** Hashed word n-gram shingles (order-sensitive combine). */
  def hashedShingles(s: String, n: Int): Array[Long] = {
    val th = tokenHashes(s)
    if (th.length < n) return Array.emptyLongArray
    val out = new Array[Long](th.length - n + 1)
    var i = 0
    while (i < out.length) {
      var acc = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        acc = fmix64(acc * 31L + th(i + j))
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** 64-bit SimHash over token hashes (sign vote per bit). */
  def simhash64(s: String): Long = {
    val th = tokenHashes(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Fraction of units covered by the most frequent unit: sort, scan
    * run lengths, maxRun/total. TAKES OWNERSHIP of `units` — the array
    * is sorted IN PLACE (callers here always pass freshly built
    * arrays; clone first if order matters downstream). -1.0 for an
    * empty unit array (mirrors the explode form, where such docs fall
    * out of the aggregation and a left join nulls them to -1).
    */
  def topFreqRatio(units: Array[Long]): Double = {
    if (units.isEmpty) return -1.0
    java.util.Arrays.sort(units)
    var maxRun = 1
    var run = 1
    var i = 1
    while (i < units.length) {
      if (units(i) == units(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
      else run = 1
      i += 1
    }
    maxRun.toDouble / units.length
  }

  /** [[topFreqRatio]] over a string's word n-grams (n=1: words). */
  def topNgramRatio(s: String, n: Int): Double =
    topFreqRatio(if (n == 1) tokenHashes(s) else hashedShingles(s, n))

  /** k seeded min-hashes over a long-array shingle set, one pass.
    * Null SLOTS are skipped — a null shingle is no shingle; an
    * unguarded getLong would read 0 from UnsafeArrayData and hash a
    * phantom shingle into every signature. (The gate path feeds
    * [[HashedShingles]] output, containsNull=false — the guard is for
    * caller-supplied arrays.)
    */
  def minhashSig(sh: ArrayData, k: Int): Array[Long] = {
    val n = sh.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val s = sh.getLong(i)
        var seed = 0
        while (seed < k) {
          val h = fmix64(s ^ (0x9e3779b97f4a7c15L * (seed + 1)))
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    mins
  }
}

/** array<long> of hashed word n-gram shingles of a string. */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.hashedShingles(input.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TextHash.hashedShingles($c.toString(), $n));")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingles"
}

/** Generator (UDTF) form of shingling: one input row → (pos,
  * shingle_hash) output rows, streamed by GenerateExec without the
  * ArrayData materialization + explode hop of
  * `posexplode(hashed_shingles(text, n))`. The §2.11 tier between
  * scalar expressions and whole physical operators: lateral-view /
  * select-generator usable, registered as `explode_shingles`.
  * Generators evaluate row-at-a-time inside GenerateExec (only
  * built-in explode/posexplode get codegen), so this sits OFF the
  * per-pair hot paths — the dedup operators keep the codegen'd array
  * form there.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle_hash", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"explode_shingles requires a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val hashes = TextHash.hashedShingles(v.asInstanceOf[UTF8String].toString, n)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < hashes.length
        override def next(): InternalRow = {
          val r = InternalRow(i, hashes(i)); i += 1; r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)

  override def prettyName: String = "explode_shingles"
}

/** array<long> of per-token FNV-1a hashes of a string's space-separated
  * tokens — the shared kernel under [[SimHash64]], exposed so the
  * simhash vote/bit logic can be differentially rebuilt from Spark
  * built-ins (explode + sum votes) and compared (dedup_simhash query).
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.tokenHashes(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TextHash.tokenHashes($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

/** Repetition signal: fraction of a string's word n-grams covered by
  * the most frequent one (Gopher-style quality filtering), computed in
  * one pass per ROW — no explode, no shuffle. -1.0 when the doc has no
  * n-grams. Counting is over FNV-64 n-gram hashes (collisions are
  * vanishing at any plausible doc length); the DuckDB oracle counts the
  * STRINGS, so the correctness gate doubles as a collision check.
  */
case class TopNgramRatio(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_ngram_ratio requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.topNgramRatio(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHash.topNgramRatio($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): TopNgramRatio =
    copy(child = newChild)

  override def prettyName: String = "top_ngram_ratio"
}

/** 64-bit SimHash of a string's whitespace tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextHash.simhash64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Subword token count of a string under a fitted BPE merge-rank
  * table ([[graft.functions.Bpe]]). The table is a driver-fitted
  * model attached via `ctx.addReferenceObj` (PqExpressions pattern) —
  * the apply stays a zero-shuffle codegen'd projection with no
  * per-row table deserialization.
  */
case class BpeTokenCount(child: Expression,
                         ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.tokenCount(input.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.tokenCount($c.toString(), $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

/** k-entry MinHash signature (array<long>) of an array<long> shingle set. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.minhashSig(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TextHash.minhashSig($c, $k));")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
