package graft

import graft.core.SparkSessionFactory

/** Dev diagnostic (round 14): run one gate warm and print every Spark
  * job's wall clock + stage count — the tool that attributed q349's
  * sf0.1 wall to task-launch latency (83 jobs × 32 near-empty tasks)
  * and motivated the rows-per-partition spread policy in linkageParts.
  * Not part of the driver contract.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProbe q349_..."`
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val spark = SparkSessionFactory.local(32, "graft-job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobs.put(js.jobId, (System.nanoTime(), js.stageIds.size, desc))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.get(je.jobId)
          if (st != null) {
            val sec = (System.nanoTime() - st._1) / 1e9
            done.add(f"job=${je.jobId}%3d stages=${st._2}%2d sec=$sec%6.3f  ${st._3.take(90)}")
          }
        }
      })
    // warm pass (JVM/codegen), then the measured pass
    val d = SparkEntry.modules.toMap.apply(name)
    d.build(spark, sfDir).collect()
    done.clear()
    val t0 = System.nanoTime()
    d.build(spark, sfDir).collect()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    done.forEach(s => println(s))
    println(f"TOTAL $name sec=$total%.3f jobs=${done.size}")
    spark.stop()
  }
}
