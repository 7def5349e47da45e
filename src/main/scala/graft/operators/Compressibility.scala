package graft.operators

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (the Gopher/RefinedWeb heuristic:
  * template/boilerplate-heavy text compresses far better than natural
  * prose, near-random noise barely compresses at all — both tails are
  * low-quality). DEFLATE at a fixed level via `java.util.zip`
  * (public JDK API, zlib semantics).
  *
  * Oracle design: the compressed size is deterministic for a given
  * zlib build but not portable arithmetic, so the registered query
  * emits DuckDB-exact companions (raw length) plus contract booleans
  * (the stored-block size bound; a doubled document compresses to
  * less than twice the original — the back-reference guarantee), and
  * the value-level properties live in CompressSpec — the invariant-
  * harness pattern used for every lossy/engine-local kernel.
  *
  * Scale: a zero-shuffle per-partition projection; one native
  * Deflater per partition, reset per row, released on exhaustion.
  */
object Compressibility {

  final case class Signal(doc_id: Long, n_raw: Long, n_deflate: Long,
                          n_deflate_doubled: Long, ratio_x1e4: Long)

  /** Size of `bytes` after DEFLATE with the given (reset) deflater. */
  def deflateSize(bytes: Array[Byte], d: Deflater): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** zlib's worst-case DEFLATE size: stored blocks of <= 16383 bytes
    * (5 bytes framing each, at least one block even for empty input)
    * + 2-byte header + 4-byte checksum.
    */
  def storedBound(nRaw: Long): Long =
    nRaw + 5L * math.max(1L, (nRaw + 16382L) / 16383L) + 6L

  def signals(spark: SparkSession, docs: DataFrame, idCol: String,
              textCol: String, level: Int = 6): Dataset[Signal] = {
    require(level >= 0 && level <= 9, s"deflate level must be 0..9, got $level")
    import spark.implicits._
    // A null body has no bytes to compress — no signal row (the typed
    // kernel would NPE on getBytes otherwise). Mirrored in the
    // registered oracle with `WHERE text IS NOT NULL`.
    docs.select(col(idCol).cast("long"), col(textCol))
      .where(col(textCol).isNotNull).as[(Long, String)]
      .mapPartitions { it =>
        val d = new Deflater(level)
        new Iterator[Signal] {
          override def hasNext: Boolean = {
            val more = it.hasNext
            if (!more) d.end()
            more
          }
          override def next(): Signal = {
            val (id, text) = it.next()
            val b = text.getBytes("UTF-8")
            val doubled = (text + " " + text).getBytes("UTF-8")
            val n = deflateSize(b, d)
            val n2 = deflateSize(doubled, d)
            Signal(id, b.length.toLong, n, n2,
              if (b.length == 0) 0L else n * 10000L / b.length)
          }
        }
      }
  }
}
