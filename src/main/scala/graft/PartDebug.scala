package graft
import org.apache.spark.sql.functions._
object PartDebug {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val e = (1L to 100L).map(i => (i, i % 7)).toDF("src", "dst")
      val pinned = e.repartition($"src").localCheckpoint()
      println(s"AQE=$aqe pinned: " + pinned.queryExecution.executedPlan.outputPartitioning)
      val ranks = (1L to 100L).map(i => (i, 1000000L)).toDF("src", "rank")
      val j = pinned.join(ranks.hint("shuffle_merge"), "src")
      val exchanges = j.queryExecution.executedPlan.collect {
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
      }
      println(s"AQE=$aqe exchanges in join initial plan: " + exchanges.size)
    }
    spark.stop()
  }
}
