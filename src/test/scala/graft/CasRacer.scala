package graft

import org.apache.hadoop.conf.Configuration

import graft.sources.RloMeta

/** Subprocess body for SqlDmlSpec's TWO-OS-PROCESS commit race (the
  * r12 "multi-process writer safety" residual): each racer appends
  * `n` versions to the same table root through the real
  * [[RloMeta.publishVersion]] CAS — read head, try head+1, rebase on
  * loss. No coordination beyond the version-file create itself.
  *
  * Spawned as `java -cp <test classpath> graft.CasRacer <root> <tag>
  * <n>`; needs no SparkSession (metadata IO only), so the race is a
  * pure two-JVM filesystem protocol test. */
object CasRacer {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, nStr) = args
    val conf = new Configuration()
    val n = nStr.toInt
    var landed = 0
    var attempts = 0
    while (landed < n && attempts < n * 1000) {
      attempts += 1
      val head = RloMeta.headVersion(conf, root)
      if (RloMeta.publishVersion(conf, root, head + 1,
          (head + 1).toLong, Seq(s"$tag-$landed")))
        landed += 1
    }
    println(s"DONE $tag landed=$landed attempts=$attempts")
    if (landed < n) sys.exit(2)
  }
}
