package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.core.JobArgs

/** Validation matrix mirroring the reference's keeper tests
  * (tests/keeper/test_keeper.py:29-107): date shape/range, depth
  * bounds, path shape, dttm shape.
  */
class JobArgsSpec extends AnyFunSuite {

  private val today = LocalDate.parse("2026-08-12")
  private def ok(date: String = "2026-08-01", depth: Int = 10,
                 src: String = "file:///lake/events", tgt: String = "/out/dm",
                 dttm: String = "2026-08-12 00:00:00") =
    JobArgs(date, depth, src, tgt, dttm, today)

  test("valid args parse with no warnings") {
    val a = ok()
    assert(a.date === LocalDate.parse("2026-08-01"))
    assert(a.warnings.isEmpty)
  }

  test("bad date format rejected") {
    val e = intercept[IllegalArgumentException](ok(date = "01-08-2026"))
    assert(e.getMessage.contains("yyyy-MM-dd"))
  }

  test("future date rejected") {
    intercept[IllegalArgumentException](ok(date = "2027-01-01"))
  }

  test("depth bounds: 0 and > 150 rejected, > 100 warns") {
    intercept[IllegalArgumentException](ok(depth = 0))
    intercept[IllegalArgumentException](ok(depth = 151))
    assert(ok(depth = 150).warnings.nonEmpty)
    assert(ok(depth = 100).warnings.isEmpty)
  }

  test("paths must be URIs or absolute") {
    intercept[IllegalArgumentException](ok(src = "relative/path"))
    assert(ok(src = "s3a://bucket/prefix").srcPath === "s3a://bucket/prefix")
    assert(ok(src = "hdfs://nn/lake").srcPath === "hdfs://nn/lake")
  }

  test("processedDttm must be yyyy-MM-dd HH:mm:ss") {
    intercept[IllegalArgumentException](ok(dttm = "2026-08-12T00:00:00"))
  }

  test("impossible calendar datetimes are rejected (STRICT resolver)") {
    intercept[IllegalArgumentException](ok(dttm = "2026-02-31 00:00:00"))
    intercept[IllegalArgumentException](ok(dttm = "2026-08-12 24:00:00"))
  }
}
