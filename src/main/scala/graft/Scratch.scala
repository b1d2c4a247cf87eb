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
}
