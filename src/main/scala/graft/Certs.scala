package graft

/** Certificate-cadence switch (r12 verdict #5). The table-format
  * tier's refresh/feed queries carry INLINE equality certificates —
  * q338 proves each change-feed step maintains the MV bit-for-bit,
  * q340 recomputes the cross-table join per catalog version — and
  * those certificates cost 2–3× the serving work they certify. In
  * production the serving unit runs every refresh while the
  * certificate runs on a SAMPLED cadence; this switch makes that
  * cadence measurable instead of prose:
  *
  *  - default ("on"): certificates computed inline — what the
  *    driver's correctness gate and every committed record measure;
  *  - "off": the serving unit alone — used ONLY by Bench's
  *    `cert_modes` measurement, which times both modes and commits
  *    the pair to bench_full.json metadata. With certificates off,
  *    q340's `matches_recompute` flags are emitted as declared-true
  *    without proof (the sampled-cadence contract), so this mode
  *    must never feed the oracle compare.
  *
  * A system property (not an env var) so one JVM can flip it between
  * timed runs. */
object Certs {
  def enabled: Boolean =
    !sys.props.get("graft.cert.mode").contains("off")
}
