package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels.
  *
  * The compositional DataFrame form of PQ (m × nCodes argmin-L2 struct
  * expressions, each a literal-array dot) generates 10k+ lines of Java
  * per operator — past janino's limits, so the whole stage silently
  * falls back to interpreted evaluation. Each expression here is one
  * tight loop with the codebook attached as a reference object: small
  * bytecode, whole-stage-codegen-safe, and ~m× less work per row.
  *
  * Codebook layout: books(s)(c) is the sub-centroid for subspace s,
  * code c; all sub-centroids have length dim/m.
  */
object PqKernels {

  /** argmin-L2 code per subspace → m int codes; null for truncated
    * embeddings (same contract as VectorKernels.dot — corrupt rows
    * fall out of rankings instead of crashing the stage).
    */
  /** True if any of the first n elements is null — the parquet schema
    * allows containsNull, and getFloat over a null slot reads garbage;
    * such rows take the same null-out path as truncated embeddings.
    */
  private def hasNullElement(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def encode(emb: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val subDim = books(0)(0).length
    if (emb.numElements() < m * subDim) return null
    if (hasNullElement(emb, m * subDim)) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val book = books(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = emb.getFloat(base + j) - cw(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Flat m×nCodes ADC lookup table: t(s*nCodes + c) = dot(q_s, books(s)(c));
    * null for truncated embeddings (see [[encode]]).
    */
  def adcTables(emb: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val nCodes = books(0).length
    val subDim = books(0)(0).length
    if (emb.numElements() < m * subDim) return null
    if (hasNullElement(emb, m * subDim)) return null
    val out = new Array[Double](m * nCodes)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val book = books(s)
      var c = 0
      while (c < nCodes) {
        val cw = book(c)
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          acc += emb.getFloat(base + j).toDouble * cw(j)
          j += 1
        }
        out(s * nCodes + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC approximate dot: sum of m table lookups. Codes arrays come
    * from [[PqEncode]] (containsNull=false); a null slot in a
    * caller-supplied array would read as code 0 through an unguarded
    * getInt and silently score against the wrong centroid — fail
    * loudly instead.
    */
  def adcScore(tables: ArrayData, codes: ArrayData, nCodes: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(
          s"adc_score: null PQ code at subspace $s — codes must come from pq_encode")
      acc += tables.getDouble(s * nCodes + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** Reconstructed norm from codes: sqrt(Σ_s |books(s)(code_s)|²).
    * Same null-code contract as [[adcScore]].
    */
  def reconNorm(codes: ArrayData, normSq: Array[Array[Double]]): Double = {
    var acc = 0.0
    var s = 0
    while (s < normSq.length) {
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(
          s"recon_norm: null PQ code at subspace $s — codes must come from pq_encode")
      acc += normSq(s)(codes.getInt(s))
      s += 1
    }
    math.sqrt(acc)
  }
}

/** array<int> PQ codes of an array<float> embedding. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got $other")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.PqKernels.encode($c, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Flat array<double> ADC lookup tables of a query embedding. */
case class PqAdcTables(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_tables requires array<float>, got $other")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.adcTables(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.PqKernels.adcTables($c, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTables =
    copy(child = newChild)

  override def prettyName: String = "pq_adc_tables"
}

/** ADC score: m lookups of the query tables at the candidate's codes. */
case class PqAdcScore(left: Expression, right: Expression, nCodes: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (array<double> tables, array<int> codes), got $other")
    }

  override protected def nullSafeEval(tables: Any, codes: Any): Any =
    PqKernels.adcScore(
      tables.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], nCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.expressions.PqKernels.adcScore($t, $c, $nCodes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)

  override def prettyName: String = "pq_adc_score"
}

/** Reconstructed-vector norm from PQ codes (for the cosine denominator). */
case class PqReconNorm(child: Expression, normSq: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_recon_norm requires array<int>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.reconNorm(input.asInstanceOf[ArrayData], normSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normSq", normSq, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.reconNorm($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconNorm =
    copy(child = newChild)

  override def prettyName: String = "pq_recon_norm"
}
