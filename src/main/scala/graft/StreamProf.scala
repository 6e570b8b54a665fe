package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run one streaming query and print the per-batch duration
  * breakdown from StreamingQueryProgress, to locate the fixed per-row cost
  * of the streaming harness (query start, batch planning, state commit,
  * sink). args: <sfDir> <queryName> [repeat]
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("GRAFT_STATE_PARTS").foreach(v =>
      spark.conf.set("graft.streaming.statePartitions", v))
    sys.env.get("GRAFT_CKPT_DIR").foreach(v =>
      spark.conf.set("graft.streaming.checkpointDir", v))
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[prof] query started ${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[prof] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[prof] query terminated ${System.nanoTime() / 1e9}")
    }
    spark.streams.addListener(listener)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[prof] $name run$i: $dt%.3f s ($n rows)")
    }
    spark.stop()
  }
}
