package graft

import org.apache.spark.sql.functions._
import graft.operators.{DocFilter, FilterCompiler}

/** Filter/iterator algebra — fixtures from FIXTURES.md §1.4/§1.6
  * (rs/index/src/query/planner.rs:172-493, iters/mod.rs:66-80). */
class FilterCompilerSpec extends SparkSuite {
  import spark.implicits._

  private def universe(ids: Long*) =
    ids.map(i => (0L, i)).toDF("user_id", "point_id")

  private def terms(rows: (String, Long)*) =
    rows.map { case (t, p) => (0L, t, p) }.toDF("user_id", "term", "point_id")

  private def pts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("point_id").collect().map(_.getLong(0)).sorted.toSeq

  test("iterator algebra: (A and B) or C = [3,4,5,6,7,8]") {
    // A=[1..5], B=[3..7], C=[4..8] as posting lists of three terms
    val t = terms(
      (1L to 5L).map(i => "f:a" -> i) ++
        (3L to 7L).map(i => "f:b" -> i) ++
        (4L to 8L).map(i => "f:c" -> i): _*)
    val u = universe(1L to 10L: _*)
    val f = DocFilter.Or(Seq(
      DocFilter.And(Seq(
        DocFilter.Contains("f", "a", keyword = true),
        DocFilter.Contains("f", "b", keyword = true))),
      DocFilter.Contains("f", "c", keyword = true)))
    assert(pts(FilterCompiler.compile(f, t, u)) === Seq(3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("stemming Contains: 'running connections' matches only the doc with both stems") {
    // planner.rs:443-493: point 1 has field:run and field:connect; point 2 only field:run
    val t = terms("field:run" -> 1L, "field:connect" -> 1L, "field:run" -> 2L)
    val u = universe(1L, 2L)
    val got = FilterCompiler.compile(
      DocFilter.Contains("field", "running connections"), t, u)
    assert(pts(got) === Seq(1L))
  }

  test("unknown term and empty value yield empty results") {
    val t = terms("field:run" -> 1L)
    val u = universe(1L, 2L)
    assert(pts(FilterCompiler.compile(DocFilter.Contains("field", "nosuchterm"), t, u)).isEmpty)
    assert(pts(FilterCompiler.compile(DocFilter.Contains("field", "   "), t, u)).isEmpty)
  }

  test("NotContains implements the todo!() of planner.rs:120-123") {
    val t = terms("field:run" -> 1L, "field:walk" -> 2L)
    val u = universe(1L, 2L, 3L)
    val got = FilterCompiler.compile(DocFilter.NotContains("field", "running"), t, u)
    assert(pts(got) === Seq(2L, 3L))
  }

  test("Ids filter + empty And/Or edge cases") {
    val t = terms("f:x" -> 1L)
    val u = universe(1L, 2L, 3L)
    assert(pts(FilterCompiler.compile(DocFilter.Ids(Seq(2L, 3L, 99L)), t, u)) === Seq(2L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.And(Nil), t, u)) === Seq(1L, 2L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.Or(Nil), t, u)).isEmpty)
  }
}
