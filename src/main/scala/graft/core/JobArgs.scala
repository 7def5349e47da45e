package graft.core

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Validated job-argument record — the engine's analog of the
  * reference's pydantic ArgsKeeper (reference src/keeper/keeper.py:
  * 10-57, validation 75-87 and 156-184): a plain case class plus a
  * constructor-time validation matrix, no framework.
  *
  * Bounds mirror the reference: depth ≤ [[JobArgs.MaxDepth]] with a
  * warning past [[JobArgs.WarnDepth]]; ISO dates; not-in-the-future
  * windows; source/target paths must be URIs with a scheme (the
  * reference checks s3-path shape — we accept any filesystem scheme
  * the Hadoop FS layer can serve).
  */
final case class JobArgs(date: LocalDate, depth: Int,
                         srcPath: String, tgtPath: String,
                         processedDttm: String, warnings: Seq[String])

object JobArgs {

  val MaxDepth = 150
  val WarnDepth = 100
  // STRICT + era-less year: the default SMART resolver would silently
  // accept impossible dates like 2026-02-31 (clamping to Feb 28)
  private val dttmFmt = DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  private def requireArg(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalArgumentException(msg)

  private def hasScheme(p: String): Boolean =
    p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.+") || p.startsWith("/")

  /** Parse + validate; throws IllegalArgumentException on hard
    * violations, accumulates soft bounds into `warnings`.
    */
  def apply(dateStr: String, depth: Int, srcPath: String, tgtPath: String,
            processedDttm: String,
            today: LocalDate = LocalDate.now()): JobArgs = {
    val date =
      try LocalDate.parse(dateStr, DateTimeFormatter.ISO_LOCAL_DATE)
      catch { case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"date must be yyyy-MM-dd, got '$dateStr'")
      }
    requireArg(!date.isAfter(today), s"date $date is in the future")
    requireArg(depth >= 1, s"depth must be >= 1, got $depth")
    requireArg(depth <= MaxDepth, s"depth must be <= $MaxDepth, got $depth")
    requireArg(hasScheme(srcPath), s"srcPath must be a URI or absolute path, got '$srcPath'")
    requireArg(hasScheme(tgtPath), s"tgtPath must be a URI or absolute path, got '$tgtPath'")
    try java.time.LocalDateTime.parse(processedDttm, dttmFmt)
    catch { case _: java.time.format.DateTimeParseException =>
      throw new IllegalArgumentException(
        s"processedDttm must be a valid yyyy-MM-dd HH:mm:ss, got '$processedDttm'")
    }
    val warnings =
      if (depth > WarnDepth)
        Seq(s"depth $depth exceeds $WarnDepth: the partition window spans >$WarnDepth days")
      else Nil
    new JobArgs(date, depth, srcPath, tgtPath, processedDttm, warnings)
  }
}
