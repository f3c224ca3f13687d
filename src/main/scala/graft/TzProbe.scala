package graft
import org.apache.spark.sql.SparkSession
object TzProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (z <- Seq("UTC", "US/Eastern")) {
      spark.conf.set("spark.sql.session.timeZone", z)
      val r = spark.sql(
        """SELECT
          |  timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',
          |                TIMESTAMP_NTZ '2024-03-10 02:30:00') AS d,
          |  unix_micros(CAST(TIMESTAMP_NTZ '2024-03-10 02:30:00' AS TIMESTAMP)) AS raw
          |""".stripMargin).head
      println(s"ZONE=$z diff=${r.getLong(0)} raw=${r.getLong(1)}")
    }
    spark.stop()
  }
}
