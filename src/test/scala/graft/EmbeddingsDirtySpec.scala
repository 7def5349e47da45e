package graft

import org.apache.spark.sql.functions._

/** Dirty-data robustness for the EMBEDDINGS tier — the fourth dirty
  * surface (documents / payloads / events / vectors). Real embedding
  * corpora carry the failure modes the clean fixture can't: NULL
  * vectors (upstream encoder timeouts), empty arrays, short/long
  * vectors (dimension drift between model versions), all-zero
  * vectors (padding rows — cosine's 0/0), NaN and ±Infinity
  * components (fp16 overflow on ingest), NULL components inside an
  * otherwise-valid vector, and a NULL label. This spec appends those
  * rows to a clean sf0.001 corpus and runs EVERY registered query
  * against the dirty dir. Contract: no query throws — dirty vectors
  * degrade to nulls / dropped candidates, never a task failure.
  */
class EmbeddingsDirtySpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_emb").toString
    val src = new java.io.File(sfDir)
    src.listFiles().filter(_.getName != "embeddings.parquet").foreach { f =>
      val dst = java.nio.file.Paths.get(dir, f.getName)
      if (f.isDirectory) {
        java.nio.file.Files.createDirectories(dst)
        f.listFiles().foreach(p => java.nio.file.Files.copy(p.toPath,
          dst.resolve(p.getName)))
      } else java.nio.file.Files.copy(f.toPath, dst)
    }
    val clean = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def vec(f: Int => Float): Array[java.lang.Float] =
      Array.tabulate[java.lang.Float](64)(i => f(i))
    // ids continue the clean id space (clean sf0.001 tops out well
    // below 900000) and stay OFF the query-set residues where the
    // planted pathology would become a query vector itself
    val dirty = Seq[(Long, Array[java.lang.Float], Integer)](
      (900001L, null, 1), // null vector
      (900002L, Array.empty[java.lang.Float], 2), // empty array
      (900003L, Array.tabulate[java.lang.Float](16)(_.toFloat), 3), // short
      (900004L, Array.tabulate[java.lang.Float](128)(_.toFloat), 4), // long
      (900005L, vec(_ => 0.0f), 5), // all-zero (cosine 0/0)
      (900006L, vec(i => if (i == 7) Float.NaN else 0.1f), 6),
      (900007L, vec(i => if (i == 3) Float.PositiveInfinity else 0.1f), 7),
      (900008L, vec(i => if (i == 9) Float.NegativeInfinity else 0.1f), 8),
      (900009L, { val a = vec(_ => 0.2f); a(11) = null; a }, 9), // null slot
      (900010L, vec(i => 0.05f * i), null.asInstanceOf[Integer])) // null label
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int"))
    clean.unionByName(dirty)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every registered query survives a pathological embeddings table") {
    val failures = scala.collection.mutable.ListBuffer[(String, String)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, dirtyDir).collect(); () }
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n -> $m" }.mkString)
  }
}
