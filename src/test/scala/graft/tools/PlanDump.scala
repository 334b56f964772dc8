package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection: prints `explain("formatted")` for each query
  * (or the SPARK_GRAFT_ONLY regex subset) so scan pruning (`ReadSchema`,
  * `PushedFilters`), broadcast vs shuffle joins, and WholeStageCodegen
  * spans can be reviewed per operator.
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.01"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"[plan] failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
