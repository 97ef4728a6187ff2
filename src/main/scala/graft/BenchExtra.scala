package graft

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1): per-query noop-sink timings with
  * repeats plus `.explain("formatted")` capture, SEPARATE from the frozen
  * `Bench` main. Mirrors Bench's session config exactly (same master, same
  * shuffle partitions, same AQE/scan settings) so its numbers are comparable
  * to the driver's queries phase, but adds:
  *   - repeats per query (warm-vs-cold JIT separation);
  *   - optional plan dump per query (SPARK_GRAFT_BENCHX_PLANS=dir);
  *   - optional query-name filter (args) for isolating one operator;
  *   - optional fresh-cache mode (SPARK_GRAFT_BENCHX_FRESH=1) that clears
  *     the persisted-DF cache between queries, exposing cross-query cache
  *     reuse that the alphabetical bench order otherwise hides.
  * Never run by the driver; cited from OPTIMIZATION_r06.md only.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCHX_REPEATS", "1").toInt
    val fresh = sys.env.get("SPARK_GRAFT_BENCHX_FRESH").contains("1")
    val planDir = sys.env.get("SPARK_GRAFT_BENCHX_PLANS")
    val only = args.toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    planDir.foreach(d => new java.io.File(d).mkdirs())

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }

    val results = qs.map { case (name, fn) =>
      if (fresh) spark.sharedState.cacheManager.clearCache()
      planDir.foreach { d =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val fw = new java.io.FileWriter(s"$d/$name.txt")
        try fw.write(txt) finally fw.close()
      }
      val samples = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"benchx:$name")
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[benchx] $name%-24s ${samples.map(s => f"$s%.2f").mkString(" ")}")
      (name, samples)
    }
    val total = results.map(_._2.head).sum
    val json = results.map { case (n, ss) =>
      s""""$n":[${ss.map(s => f"$s%.3f").mkString(",")}]"""
    }.mkString(",")
    println(f"""{"benchx_total_first":$total%.1f,"repeats":$repeats,"fresh":$fresh,"queries":{$json}}""")
    spark.stop()
  }
}
