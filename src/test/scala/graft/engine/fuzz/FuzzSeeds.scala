package graft.engine.fuzz

/**
 * Seed policy for the fuzz suites (r13 verdict: rotate seeds in CI).
 * Defaults ROTATE by calendar date — the one-off 6×-volume fresh-seed
 * soak found two harness bugs the pinned seeds had ossified around, so
 * fresh slices of the case space are the default, not a special event —
 * while one small PINNED pass per suite keeps the historical regression
 * corpus running every day. An env override replays any CI day exactly:
 * each suite's info/failure lines print the active seed and its env var,
 * so a red run is reproduced with `SPARK_GRAFT_*_SEED=<printed> sbt
 * "testOnly <suite>"`.
 */
object FuzzSeeds {
  /** The pre-rotation CI defaults, kept as the pinned regression passes. */
  val PinnedA = 20260815L
  val PinnedB = 20260816L

  /** Env override wins; otherwise a date-derived seed (Knuth-multiplier
    * spread so consecutive days land far apart; per-suite salt decouples
    * the suites' case streams from each other). */
  def resolve(envVar: String, salt: Long): Long =
    sys.env.get(envVar).map { raw =>
      // name the env var on a typo'd override instead of dying with a
      // bare NumberFormatException from somewhere inside a suite
      try raw.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$envVar must be a long seed, got '$raw'")
      }
    }.getOrElse(
      java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay * 2654435761L + salt)

  /** The standard two passes: a small pinned-regression slice plus the
    * full rotating (or env-overridden) pass. */
  def passes(envVar: String, salt: Long, pinned: Long, pinnedN: Int,
      n: Int): Seq[(Long, Int)] =
    Seq((pinned, pinnedN), (resolve(envVar, salt), n))
}
