package graft.runner

/** Driver-process resource snapshot — the reference records CPU and RSS
  * from `/proc/self/{stat,status}` alongside every validation run
  * (`src/app2/experiments/resource_metrics.py:18-63`); this is the same
  * reading for the Spark driver process, with a JVM-MXBean fallback off
  * Linux. Executor-side resource accounting comes from Spark's own
  * metrics system; this snapshot is the driver-side bookkeeping twin the
  * result tables carry.
  */
final case class ResourceSnapshot(cpu_ms: Long, rss_kb: Long)

object ResourceMetrics {

  private val ClkTck = 100L // USER_HZ; fixed at 100 on linux-amd64

  def snapshot(): ResourceSnapshot =
    try {
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      // comm (field 2) may contain spaces — parse after the closing paren
      val fields = raw.substring(raw.lastIndexOf(')') + 2).split(' ')
      // fields(11)=utime, fields(12)=stime (stat fields 14,15, 1-based)
      val cpuMs = (fields(11).toLong + fields(12).toLong) * 1000L / ClkTck
      val rssKb = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/self/status")).asScala
          .find(_.startsWith("VmRSS:"))
          .map(_.replaceAll("[^0-9]", "").toLong)
          .getOrElse(jvmRssKb)
      }
      ResourceSnapshot(cpuMs, rssKb)
    } catch { case scala.util.control.NonFatal(_) => jvmFallback }

  private def jvmRssKb: Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1024L
  }

  private def jvmFallback: ResourceSnapshot = {
    val cpuNs = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => 0L
    }
    ResourceSnapshot(cpuNs / 1000000L, jvmRssKb)
  }
}
