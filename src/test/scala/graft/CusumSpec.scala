package graft

/** w_cusum_drift gate: the window formulation
  * C_h = S_h − min(0, min_{j≤h} S_j) must equal the textbook clamped
  * recurrence C_h = max(0, C_{h−1} + x_h) replayed directly in
  * driver-side Long arithmetic from the query's own hourly counts —
  * the identity the scaladoc claims, proven on real data, not a
  * constructed toy. Value-level cross-engine truth is oracle-gated. */
class CusumSpec extends SparkSpec {

  test("window CUSUM equals the clamped recurrence, both sides") {
    val rows = Registry.byName("w_cusum_drift").run(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (etype, rs) =>
      val seq = rs.sortBy(_._2.getTime)
      val ns = seq.map(_._3)
      val muFp = ns.sum * 1000000L / ns.length
      val slack = muFp / 10L
      var up = 0L
      var dn = 0L
      seq.foreach { case (_, _, n, gotUp, gotDn, flagUp, flagDn) =>
        val d = n * 1000000L - muFp
        up = math.max(0L, up + d - slack)
        dn = math.max(0L, dn - d - slack)
        assert(gotUp == up, s"$etype up: got $gotUp want $up")
        assert(gotDn == dn, s"$etype dn: got $gotDn want $dn")
        assert(flagUp == (up > muFp) && flagDn == (dn > muFp))
      }
    }
  }
}
