package graft

/** Round-rotating fuzz seed base: each driver round shifts every fuzz
  * suite's seed range by 100000·round (round = number of BENCH_r*.json
  * artifacts in the repo root — monotone per round and visible in git),
  * so successive rounds explore fresh config space without losing
  * replay: any historical round re-runs by pinning GRAFT_FUZZ_ROUND.
  * The base is a multiple of 10, so `seed % 10` pinning (the
  * empty-slice guarantee) keeps its density across rounds. */
object FuzzRound {
  val round: Int = sys.env.get("GRAFT_FUZZ_ROUND").map(_.toInt).getOrElse {
    Option(new java.io.File(sys.props.getOrElse("user.dir", "."))
        .listFiles())
      .map(_.count(_.getName.matches("BENCH_r\\d+\\.json"))).getOrElse(0)
  }
  val base: Int = 100000 * round
}
