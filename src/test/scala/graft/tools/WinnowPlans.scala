package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway plan dumper for plans/r11 (not part of the suite). */
object WinnowPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val after = graft.dedup.ExactSubstr.winnowedCandidates(docs, "doc_id", "text")
    val minLen = 50; val w = 10; val maxPerGram = 1000
    val anchors = docs.select(col("doc_id").as("id"),
        explode(graft.functions.winnowedAnchors(col("text"), minLen, w)).as("a"))
      .select(col("id"), col("a.i").as("i"), col("a.h").as("h"))
    val hot = anchors.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxPerGram).select("h")
    val before = anchors
      .join(broadcast(hot), Seq("h"), "left_anti")
      .groupBy("h").agg(collect_list(struct(col("id"), col("i"))).as("xs"))
      .filter(size(col("xs")).between(2, maxPerGram))
      .select(col("h"), explode(flatten(transform(col("xs"), x =>
        transform(
          filter(col("xs"), y => y.getField("id") > x.getField("id") ||
            (y.getField("id") === x.getField("id") &&
             y.getField("i") > x.getField("i"))),
          y => struct(
            x.getField("id").as("id_a"), x.getField("i").as("pos_a"),
            y.getField("id").as("id_b"), y.getField("i").as("pos_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.pos_a").as("pos_a"),
        col("p.id_b").as("id_b"), col("p.pos_b").as("pos_b"), col("h"))
    def cap(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      "/root/repo/plans/r11/exact_substr_winnowed_before.txt"), cap(before).getBytes)
    // the r11 walk's output DataFrame is createDataFrame(rdd) — its own
    // plan is just `Scan ExistingRDD`; the shuffle+sort it consumes is the
    // child query execution, dumped alongside so the plan evidence shows
    // the whole shape (anchor scan → ONE exchange → ONE sort → walk)
    val sortedChild = anchors.select(col("h"), col("id"), col("i"))
      .repartition(col("h")).sortWithinPartitions("h")
    java.nio.file.Files.write(java.nio.file.Paths.get(
      "/root/repo/plans/r11/exact_substr_winnowed_after.txt"),
      ("# child pipeline the sorted-run walk consumes (anchor scan -> one Exchange -> one Sort;\n" +
       "# the walk itself is a mapPartitions over this, surfacing as Scan ExistingRDD below)\n" +
       cap(sortedChild) +
       "\n# outer plan of winnowedCandidates' returned DataFrame:\n" +
       cap(after)).getBytes)
    val b = before.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = after.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    println(s"WINNOW_EQUAL=${a == b} n=${a.size}")
    spark.stop(); sys.exit(0)
  }
}
