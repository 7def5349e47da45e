package graft

import org.apache.spark.sql.functions._
import graft.operators.BudgetSelect

class BudgetSelectSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "n_tok", "score")
  }

  private def naive(rows: Seq[(Long, Long, Long)], budget: Long): Map[Long, Boolean] = {
    var cum = 0L
    rows.sortBy { case (id, _, s) => (-s, id) }.map { case (id, t, _) =>
      cum += t
      id -> (cum <= budget)
    }.toMap
  }

  test("matches the naive global cumsum, including ties across the boundary") {
    val rnd = new scala.util.Random(17)
    // few distinct scores → boundary score holds many docs
    val rows = (0L until 200L).map { id =>
      (id, 1L + rnd.nextInt(20).toLong, rnd.nextInt(5).toLong)
    }
    for (budget <- Seq(1L, 37L, 500L, 1000L, 100000L)) {
      val got = BudgetSelect.selectToTokenBudget(df(rows), "id", "n_tok", "score", budget)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(got === naive(rows, budget), s"budget=$budget")
    }
  }

  test("budget >= corpus selects everything; tiny budget selects the id-ordered best prefix") {
    val rows: Seq[(Long, Long, Long)] =
      Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 5L, 1L))
    val all = BudgetSelect.selectToTokenBudget(df(rows), "id", "n_tok", "score", 15L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(all === Map(1L -> true, 2L -> true, 3L -> true))
    val tight = BudgetSelect.selectToTokenBudget(df(rows), "id", "n_tok", "score", 7L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // only doc 1 fits (5 <= 7); doc 2 would make it 10
    assert(tight === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("every input row gets exactly one verdict") {
    val rows = (0L until 50L).map(id => (id, 3L, id % 7))
    val out = BudgetSelect.selectToTokenBudget(df(rows), "id", "n_tok", "score", 60L)
    assert(out.count() === 50L)
    assert(out.select("id").distinct().count() === 50L)
  }
}
