package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AsofDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def t(label: String)(f: => Long): Unit =
      try println(s"$label=" + f)
      catch { case e: Throwable => println(s"$label=FAILED " + e.getMessage.take(120)) }
    t("read_count") { Tables.events(spark, d).count() }
    t("clicks") { Tables.events(spark, d).filter(col("event_type")==="click").count() }
    val ev = Tables.events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"), lit(0).as("tag"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
    t("union") { clicks.unionByName(purchases).count() }
    t("asof") { ops.JoinQueries.joinAsof(spark, d).count() }
    println("mergeSchema_conf=" + spark.conf.getOption("spark.sql.parquet.mergeSchema"))
    spark.stop()
  }
}
