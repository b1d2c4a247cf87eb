package graft

/** Single home for the driver-local scratch-zone convention used by
  * round-trip/sink catalog queries. One definition so a future root
  * change (env override, java.io.tmpdir) can't silently split query
  * scratch zones across directories.
  */
object Scratch {
  /** Driver-local scratch directory for a named query zone. The same
    * writers target s3a:// (or any Hadoop FS) URIs at scale. */
  def dir(name: String): String =
    s"${sys.props("user.dir")}/target/tmp/$name"

  /** Recursive local delete (children before parents), closing the
    * directory stream — `Files.walk` holds an OS handle until closed,
    * which repeated bench/verify runs would otherwise accumulate. */
  def deleteRecursively(path: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(path)) {
      val s = java.nio.file.Files.walk(path)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally s.close()
    }
}
