package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // shuffle scratch on tmpfs: shuffle index commits serialize on a
      // JVM-global lock around small-file IO; the sandbox ext4 makes that
      // lock hot enough to flatline multi-core scaling (thread dumps showed
      // executors blocked in IndexShuffleBlockResolver). A real cluster
      // would use local NVMe.
      .config("spark.local.dir", graft.spark.Scratch.localDir)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", graft.spark.Scratch.fairPoolsXml)
      .config("spark.file.transferTo", "false")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spark.Scratch.warmBlockManager(spark)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // written BEFORE the query loop: if a query wedges the session, the
    // driver still gets the oracle map + every completed dump
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query watchdog: one wedged Spark job (e.g. the rare local-mode
    // BlockManagerMaster lazy-endpoint RPC stall observed in rehearsal,
    // Spark-internal) must not zero the whole round's correctness. Each
    // query runs under a job group; on timeout the group is cancelled and
    // the loop moves on.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "900").toLong
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val pool = Executors.newCachedThreadPool()
    SparkEntry.queries.foreach { case (name, fn) =>
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(s"verify-$name", name,
            interruptOnCancel = true)
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try task.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          System.err.println(s"[verify] $name TIMED OUT after ${timeoutSec}s — cancelling")
          spark.sparkContext.cancelJobGroup(s"verify-$name")
          task.cancel(true)
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    pool.shutdownNow()
    spark.stop()
    // a cancelled-but-wedged job can leave non-daemon threads behind; the
    // dumps and oracle json are on disk, so a hard exit is safe and keeps
    // the driver's subprocess from hanging on JVM teardown
    sys.exit(0)
  }
}
