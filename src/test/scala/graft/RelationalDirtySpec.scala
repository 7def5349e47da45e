package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Dirty-data robustness for the RELATIONAL (TPC-H) tier — the fifth
  * and final dirty surface: with this, every input table the engine
  * reads has a pathological twin (documents / payloads / events /
  * embeddings / star schema). A lake's fact tables carry what the
  * generated fixtures never do: null keys (orphan facts), null
  * dates/statuses, NaN and infinite measures (upstream currency-rate
  * division), negative amounts (corrections), out-of-domain
  * discounts, duplicate keys from replayed loads. Dirty rows are
  * appended to a clean sf0.001 corpus across customer, orders, and
  * lineitem; every registered query must complete.
  */
class RelationalDirtySpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_rel").toString
    val replaced = Set("customer.parquet", "orders.parquet", "lineitem.parquet")
    new java.io.File(sfDir).listFiles()
      .filter(f => !replaced(f.getName)).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(dir, f.getName))
      }
    val t0 = Timestamp.valueOf("1996-06-01 00:00:00")

    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    cust.unionByName(Seq(
      (900001L, null.asInstanceOf[String], 1, 100.0, "BUILDING"), // null name
      (900002L, "Customer#dirty2", 2, Double.NaN, "AUTOMOBILE"), // NaN balance
      (900003L, "Customer#dirty3", 3, Double.PositiveInfinity, "MACHINERY"),
      (900004L, "Customer#dirty4", 99, -5000.0, null.asInstanceOf[String]), // null segment, orphan nation
      (-5L, "Customer#dirty5", 4, 0.0, "HOUSEHOLD")) // negative key
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("c_acctbal",
        when(col("c_custkey") === 900004L, lit(null).cast("double"))
          .otherwise(col("c_acctbal"))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("timestamp"),
        col("o_orderpriority"))
    ord.unionByName(Seq(
      (910001L, null.asInstanceOf[Any].asInstanceOf[Long], "O", 100.0, t0, "1-URGENT"),
      (910002L, 900001L, null.asInstanceOf[String], 200.0, t0, "2-HIGH"),
      (910003L, 900002L, "F", Double.NaN, t0, "3-MEDIUM"),
      (910004L, 900003L, "O", 300.0, null.asInstanceOf[Timestamp], "4-NOT SPECIFIED"),
      (910005L, 77777777L, "X", -50.0, t0, null.asInstanceOf[String]), // orphan cust, bad status
      (1L, 900001L, "O", 400.0, t0, "5-LOW")) // duplicate orderkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_custkey",
        when(col("o_orderkey") === 910001L, lit(null).cast("bigint"))
          .otherwise(col("o_custkey"))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate").cast("timestamp"))
    li.unionByName(Seq(
      (920001L, 1L, 1L, 1, Double.NaN, 100.0, 0.05, 0.02, "N", "O", t0),
      (920002L, 2L, 2L, 1, 10.0, Double.PositiveInfinity, 0.05, 0.02, "N", "O", t0),
      (920003L, 3L, 3L, 1, -4.0, 100.0, 1.5, 0.02, "R", "F", t0), // neg qty, discount > 1
      (920004L, 4L, 4L, 1, 10.0, 100.0, 0.05, 0.02,
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[Timestamp]), // null flags + shipdate
      (910005L, 99999999L, 5L, 2, 10.0, 100.0, 0.05, 0.02, "A", "F", t0)) // orphan part
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_quantity",
        when(col("l_orderkey") === 920001L, lit(Double.NaN))
          .otherwise(col("l_quantity"))))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("every registered query survives a pathological star schema") {
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
