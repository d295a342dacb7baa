package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for the flagship queries
  * so scan pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen spans can be reviewed (the "is this the plan you'd
  * want at 100 TB" check).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else
      Set("q01_interval_overlap", "q05_asof_join", "q19_tokenize",
        "q21_minhash_lsh", "q31_feature_assembly", "q36_bulk_probe_overlap",
        "q38_fused_stack", "q41_checkpoint_roundtrip")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.contains(name)) {
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
