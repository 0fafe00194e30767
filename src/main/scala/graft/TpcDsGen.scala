package graft

import org.apache.spark.sql.SparkSession

/** One-shot TPC-DS corpus generation at SPARK_GRAFT_TPCDS_SCALE (default
  * 1): writes `target/tpcds[-xN]` and exits. Bench's x10 tier registers a
  * PRE-generated corpus only (TpcDs.registerAt returns false and the tier
  * is skipped when the directory is absent — generation mid-bench would
  * pollute the timings), so run this once per scale:
  *
  *   SPARK_GRAFT_TPCDS_SCALE=10 sbt "runMain graft.TpcDsGen"
  */
object TpcDsGen {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.TpcDs.ensure(spark)
    println(s"[tpcds-gen] scale ${graft.sources.TpcDs.scale} ready at " +
      graft.sources.TpcDs.dirFor(graft.sources.TpcDs.scale))
    spark.stop()
  }
}
