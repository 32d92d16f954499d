package graft.sink

import org.scalatest.funsuite.AnyFunSuite

class CsvSinkSpec extends AnyFunSuite {

  test("partIndex orders parts numerically past the zero-padding width") {
    val names = Seq(
      "part-100000-uuid.csv",
      "part-99999-uuid.csv",
      "part-00000-uuid.csv",
      "part-00010-uuid.csv")
    val sorted = names.sortBy(CsvSink.partIndex)
    assert(sorted == Seq(
      "part-00000-uuid.csv",
      "part-00010-uuid.csv",
      "part-99999-uuid.csv",
      "part-100000-uuid.csv"))
  }

  test("partIndex puts unparseable names last, deterministically") {
    val names = Seq("part-b-x.csv", "part-a-x.csv", "part-00001-x.csv")
    val sorted = names.sortBy(CsvSink.partIndex)
    assert(sorted == Seq("part-00001-x.csv", "part-a-x.csv", "part-b-x.csv"))
  }
}
