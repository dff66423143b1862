package graft.storage

/** Test-only crash injection for the maintenance ops' chaos tests: when
  * `active` names a failpoint, reaching it throws — simulating a process
  * kill exactly at that window (after staging / after the commit manifest
  * is durable, before it is applied). Production code never sets this;
  * the recovery paths under test are the ones a REAL crash exercises,
  * because the injected throw leaves the identical on-disk state. */
private[graft] object Failpoints {
  @volatile var active: String = ""
  def hit(name: String): Unit =
    if (active == name)
      throw new IllegalStateException(s"injected crash at $name")
}
