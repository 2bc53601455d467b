package graft.pipeline

import graft.ops.LabelRule

/** Ready-made pipeline configurations mirroring the reference's shipped
  * workloads, so a BytesProcessor user can switch with one import.
  */
object Presets {

  /** CICIDS2017 Thursday working-hours attack rules + extraction ranges —
    * the reference's `__main__` configuration
    * (`/root/reference/BytesProcessor.py:360-405`): Bruteforce/XSS/SQLi
    * from 172.16.0.1 against 192.168.10.50, then four Infiltration
    * windows. Rule order preserved (last-match-wins on overlap, as in
    * the reference's sequential overwrite at `BytesProcessor.py:326-327`).
    * Extraction ranges default to the attack windows themselves, exactly
    * like `ranges_to_extract` at `BytesProcessor.py:410`.
    */
  val cicids2017ThursdayRules: Seq[LabelRule] = Seq(
    LabelRule(1499343600.0, 1499346000.0, Seq("172.16.0.1"), Seq("192.168.10.50"), "Bruteforce"),
    LabelRule(1499346900.0, 1499348100.0, Seq("172.16.0.1"), Seq("192.168.10.50"), "XSS"),
    LabelRule(1499348400.0, 1499348520.0, Seq("172.16.0.1"), Seq("192.168.10.50"), "SQLi"),
    LabelRule(1499361540.0, 1499361660.0, Seq("205.174.165.73"), Seq("192.168.10.8"), "Infiltration"),
    LabelRule(1499362380.0, 1499362500.0, Seq("205.174.165.73"), Seq("192.168.10.8"), "Infiltration"),
    LabelRule(1499363580.0, 1499364000.0, Seq("205.174.165.73"), Seq("192.168.10.25"), "Infiltration"),
    LabelRule(1499364240.0, 1499366700.0, Seq("192.168.10.8", "205.174.165.73"), Seq("192.168.10.8"), "Infiltration"))

  val cicids2017Thursday: BytesPipeline.Config = BytesPipeline.Config(
    rules = cicids2017ThursdayRules,
    rangesToExtract = cicids2017ThursdayRules.map(r =>
      (r.tsLo.asInstanceOf[Double], r.tsHi.asInstanceOf[Double])))
}
