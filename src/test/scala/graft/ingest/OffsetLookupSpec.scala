package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class OffsetLookupSpec extends AnyFunSuite {

  private val idx = new OffsetLookup.SeqIndex(Map(
    ("t", 0) -> Seq((0L, 100L), (1L, 200L), (2L, 300L), (3L, 400L)),
    ("t", 1) -> Seq((0L, 150L), (1L, 250L))
  ))

  test("window maps timestamps to first-at-or-after offsets per partition") {
    val (start, end) = OffsetLookup.window(idx, "t", 200L, 400L)
    assert(start === """{"t": {"0": 1, "1": 1}}""")
    assert(end === """{"t": {"0": 3, "1": 2}}""") // p1 has nothing ≥400 → end of log
  }

  test("empty window at end of log yields start == end") {
    val (start, end) = OffsetLookup.window(idx, "t", 999L, 1000L)
    assert(start === end)
  }

  test("string-compare offset bug is fixed numerically (9 < 10)") {
    // the reference compared "9" < "10" lexicographically (false) and
    // raised; numeric validation accepts it
    OffsetLookup.validateRange(9L, 10L)
    intercept[IllegalArgumentException](OffsetLookup.validateRange(10L, 9L))
  }
}
