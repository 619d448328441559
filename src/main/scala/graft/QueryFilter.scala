package graft

/** The ONE parser for `SPARK_GRAFT_ONLY`: a comma-separated list of
  * query names, a trailing `*` matching by prefix (`dedup_*`). Verify
  * and Bench read the same env var, so they must share one semantics —
  * they briefly didn't (Verify prefix-star, Bench exact), and a pattern
  * valid for one silently selected ZERO queries in the other. */
object QueryFilter {
  def parse(spec: String): String => Boolean = {
    val pats = spec.split(',').map(_.trim).filter(_.nonEmpty)
    name => pats.exists(p =>
      if (p.endsWith("*")) name.startsWith(p.dropRight(1)) else name == p)
  }

  def fromEnv: Option[String => Boolean] =
    sys.env.get("SPARK_GRAFT_ONLY").map(parse)
}
