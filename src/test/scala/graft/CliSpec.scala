package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Quack

/** The CLI renders from the already-collected envelope records (one
  * execution per invocation — A8); these pin the grid format.
  */
class CliSpec extends AnyFunSuite {

  test("renderTable renders columns in schema order with a row cap") {
    val cols = Seq("b", "a")
    val recs = (1 to 12).map(i => Map[String, Any]("a" -> i, "b" -> s"v$i"))
    val out = Quack.renderTable(cols, recs, maxRows = 10, truncate = 50)
    val lines = out.linesIterator.toSeq
    assert(lines.head.startsWith("+"))
    assert(lines(1) == "|b  |a |")
    // 10 data rows + 3 rules + header + footer
    assert(lines.count(_.startsWith("|")) == 11)
    assert(lines.last == "only showing top 10 row(s)")
    assert(lines(3) == "|v1 |1 |")
  }

  test("renderTable truncates wide cells and renders nulls") {
    val out = Quack.renderTable(Seq("x"),
      Seq(Map[String, Any]("x" -> ("y" * 60)), Map[String, Any]("x" -> null)),
      maxRows = 10, truncate = 50)
    assert(out.contains("y" * 47 + "..."))
    assert(!out.contains("y" * 48))
    assert(out.contains("NULL"))
  }
}
