package graft

/** Round-rotating fuzz seed base: each driver round shifts every fuzz
  * suite's seed range by 100000·round, so successive rounds explore
  * fresh config space without losing replay: any historical round
  * re-runs by pinning GRAFT_FUZZ_ROUND. The round comes from the
  * git-TRACKED `ROUND` marker file (bumped by the builder each round)
  * — not from counting workspace artifacts, whose untracked state
  * (deleted/extra BENCH files, different cwd) silently shifted the
  * seed range (round-12 advisor finding); the BENCH_r*.json count
  * remains only as a last-resort fallback for a checkout without the
  * marker. The base is a multiple of 10, so `seed % 10` pinning (the
  * empty-slice guarantee) keeps its density across rounds. The
  * resolved base is echoed once on stderr so a red run's seed band is
  * in the log. */
object FuzzRound {
  val round: Int = sys.env.get("GRAFT_FUZZ_ROUND").map(_.toInt).getOrElse {
    val dir = new java.io.File(sys.props.getOrElse("user.dir", "."))
    val marker = new java.io.File(dir, "ROUND")
    val fromMarker =
      if (marker.isFile)
        scala.util.Try(new String(java.nio.file.Files.readAllBytes(
          marker.toPath), "UTF-8").trim.toInt).toOption
      else None
    fromMarker.getOrElse {
      Option(dir.listFiles())
        .map(_.count(_.getName.matches("BENCH_r\\d+\\.json"))).getOrElse(0)
    }
  }
  val base: Int = 100000 * round
  System.err.println(s"[FuzzRound] round=$round base=$base " +
    "(override with GRAFT_FUZZ_ROUND)")
}
