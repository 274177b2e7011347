package graft
import graft.vector.VectorSearch
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01")) {
      val emb = Tables.load(spark, s"/root/testdata/sf$sf", "embeddings")
      for (assign <- Seq(4, 8, 16, 24)) {
        val n = VectorSearch.cosineNearDupPairs(emb, 0.45, assign).count()
        println(s"SF $sf assign $assign pairs $n")
      }
    }
    val emb1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    for (assign <- Seq(8, 16)) {
      val t0 = System.nanoTime()
      val n = VectorSearch.cosineNearDupPairs(emb1, 0.45, assign).count()
      println(f"SF 0.1 assign $assign pairs $n time ${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
