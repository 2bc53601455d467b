package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One attack-labeling rule: time range x (attacker set, victim set).
  * Mirrors the reference's `attack_details` entries
  * (/root/reference/BytesProcessor.py:22-33,288-337). `Any` ids so the
  * same operator serves Long user ids (events) and String IPs (pcap).
  */
final case class LabelRule(
    tsLo: Any, // timestamp string for TimestampType keys, epoch Double for the pcap pipeline
    tsHi: Any,
    attackers: Seq[Any],
    victims: Seq[Any],
    label: String)

/** Rule-based labeling (reference R8/R9).
  *
  * Semantics pinned against the reference (SURVEY.md §2.1):
  *  - rows matching no rule get "benign" (BytesProcessor.py:249);
  *  - when a row matches several rules the LAST rule in list order wins
  *    (the reference overwrites labels sequentially, :326-327). We fold
  *    rules left-to-right, each new rule wrapping the accumulator in its
  *    `otherwise`, so the last rule becomes the outermost CASE arm;
  *  - ip condition: bidirectional when both sets given (:301-305),
  *    src-only (:308-309), dst-only (:311-313);
  *  - forward mask = ts-in-range AND src in attackers, OR-ed over rules
  *    (:317-319). The reference crashes on a victim-only rule here
  *    (KeyError, a bug) — we let attacker-less rules contribute `false`.
  *
  * Everything is a pure Column expression: no join, no shuffle — at
  * 100 TB the rule set rides along in the task binary (it is tiny), and
  * whole-stage codegen compiles the CASE chain into straight-line JVM
  * bytecode.
  */
object RuleLabeler {
  def tsIn(ts: Column, r: LabelRule): Column =
    ts.between(lit(r.tsLo), lit(r.tsHi))

  private def idCond(src: Column, dst: Column, r: LabelRule): Column =
    (r.attackers.nonEmpty, r.victims.nonEmpty) match {
      case (true, true) =>
        (src.isin(r.attackers: _*) && dst.isin(r.victims: _*)) ||
          (dst.isin(r.attackers: _*) && src.isin(r.victims: _*))
      case (true, false) => src.isin(r.attackers: _*)
      case (false, true) => dst.isin(r.victims: _*)
      case _             => lit(false)
    }

  def matches(ts: Column, src: Column, dst: Column, r: LabelRule): Column =
    tsIn(ts, r) && idCond(src, dst, r)

  /** Label column, last-matching-rule-wins, default "benign". */
  def labelCol(ts: Column, src: Column, dst: Column, rules: Seq[LabelRule]): Column =
    rules.foldLeft(lit("benign")) { (acc, r) =>
      when(matches(ts, src, dst, r), lit(r.label)).otherwise(acc)
    }

  /** "Forward" (attacker-originated) row mask. */
  def forwardMask(ts: Column, src: Column, rules: Seq[LabelRule]): Column =
    rules.filter(_.attackers.nonEmpty)
      .map(r => tsIn(ts, r) && src.isin(r.attackers: _*))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
}
