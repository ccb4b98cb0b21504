package graft

/** Dev-only measurement main: per-stage shuffle WRITE bytes of one build
  * (AQE off, fixed partitioning — same shape as the scaling legs), printed
  * with the stage's callsite so exchange bytes are attributable to
  * operators. Not part of the driver contract.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = args.lift(1).map(_.toInt).getOrElse(16)
    val s = Bench.session(cpus = 8, parts = 8)
    Bench.aqe(s, on = false)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val b = i.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (b > 0) stages.merge(i.stageId, (i.name + " @ " + i.details.linesIterator.toList
          .drop(1).take(2).mkString(" | "), b),
          (a, c) => (a._1, a._2 + c._2))
      }
    })
    Bench.timedBuild(s, sfDir, scale)
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.values.toSeq.sortBy(-_._2)
    println(f"TOTAL shuffle write: ${rows.map(_._2).sum / 1e6}%.1f MB over ${rows.size} stages")
    rows.take(25).foreach { case (n, b) => println(f"${b / 1e6}%10.1f MB  $n") }
    s.stop()
  }
}
