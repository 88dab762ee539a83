package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/stress_sf10x/lineitem.parquet")
    for (c <- Seq("l_extendedprice", "l_quantity", "l_discount"); p <- Seq(0.5, 0.95)) {
      val t0 = System.nanoTime()
      val dist = graft.operators.Cleaning.exactQuantilesDistributed(li, c, Seq(p)).head.get
      val t1 = System.nanoTime()
      val agg = li.select(percentile(col(c), lit(p))).head().getDouble(0)
      val t2 = System.nanoTime()
      println(f"[qp] $c p=$p dist=$dist agg=$agg equal=${dist == agg} distT=${(t1-t0)/1e9}%.2f aggT=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
