package graft

/** Registry-invariant audit (dev tool): FAILS (nonzero exit) if any
  * module's query key shadows another's in the merged
  * [[SparkEntry.queries]] (Map ++ keeps the LAST binding — a
  * collision would hide an operator with no error anywhere), and
  * lists the keys whose oracle registers only at dump time (the
  * staged-artifact family) so a missing static oracle is a visible,
  * explained set rather than a surprise. Iterates
  * [[SparkEntry.modules]] — the same list the merge uses, so a new
  * module is audited automatically.
  * Run: `sbt "runMain graft.KeyCheck"`. */
object KeyCheck {
  def main(args: Array[String]): Unit = {
    val all = SparkEntry.modules.flatMap { case (m, (q, _)) => q.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    println(s"modsum=${all.size} merged=${SparkEntry.queries.size} dups=$dups")
    require(dups.isEmpty, s"shadowed query keys: ${dups.keys.toSeq.sorted}")
    require(all.size == SparkEntry.queries.size,
      s"merge lost keys: ${all.size} declared vs ${SparkEntry.queries.size} merged")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    println(s"queries without static oracle (staged/dump-time family): ${noOracle.toSeq.sorted}")
  }
}
