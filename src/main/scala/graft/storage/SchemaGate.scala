package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-group schema ModRevision gate on the query and write paths
 * (banyand/liaison/grpc/schema_revision.go:52-135; exercised by
 * test/cases/schema/query_gate.go and write_gate.go).
 *
 * A client caches the schema it compiled its request against and sends the
 * resource's `mod_revision` per group; the server short-circuits instead of
 * answering from a schema the client no longer holds:
 *
 *   - supplied < cached  → STATUS_EXPIRED_SCHEMA (client schema is stale)
 *   - supplied > cached  → poll up to `maxWaitMs` for the revision to
 *                          apply, then STATUS_SCHEMA_NOT_APPLIED
 *   - supplied == cached → STATUS_SUCCEED
 *   - supplied == 0, or group absent from the map → ungated (skipped)
 *   - resource not registered in the group → STATUS_NOT_FOUND
 *
 * A query whose gated groups contain ANY non-SUCCEED status returns the
 * status map with EMPTY elements (query_gate.go:211 "mixed group_statuses
 * and empty elements when one group is stale"); an empty revisions map
 * skips the gate entirely (backward compat, write_gate.go:357).
 *
 * The cached revision here is [[CatalogStore]]'s per-resource
 * `mod_revision` — the same lookup the reference's
 * `getLocatorRevision(name, group)` performs against its schema cache.
 */
object SchemaGate {

  sealed abstract class Status(val wire: String)
  case object Succeed extends Status("STATUS_SUCCEED")
  case object ExpiredSchema extends Status("STATUS_EXPIRED_SCHEMA")
  case object SchemaNotApplied extends Status("STATUS_SCHEMA_NOT_APPLIED")
  case object NotFound extends Status("STATUS_NOT_FOUND")

  /**
   * Evaluate the gate for the groups of one request. Returns the per-group
   * statuses and whether the caller must short-circuit (not execute).
   * `maxWaitMs` is ONE overall deadline shared across every "ahead" group
   * (schema_revision.go:62-64), polled with 10 ms × 1.5 backoff capped at
   * 1 s (awaitRevisionReached, schema_revision.go:115-135).
   */
  def check(groups: Seq[String], name: String,
      groupModRevisions: Map[String, Long],
      getRevision: (String, String) => Option[Long],
      maxWaitMs: Long = 0L): (Map[String, Status], Boolean) = {
    if (groupModRevisions.isEmpty) return (Map.empty, false)
    val deadline = System.currentTimeMillis() + maxWaitMs
    val statuses = groups.flatMap { g =>
      groupModRevisions.get(g) match {
        case None | Some(0L) => None // ungated group
        case Some(clientRev) => Some(g -> (getRevision(name, g) match {
          case None => NotFound
          case Some(cacheRev) if clientRev < cacheRev => ExpiredSchema
          case Some(cacheRev) if clientRev > cacheRev =>
            if (awaitRevision(() => getRevision(name, g).getOrElse(0L),
              clientRev, deadline - System.currentTimeMillis())) Succeed
            else SchemaNotApplied
          case _ => Succeed
        }))
      }
    }.toMap
    (statuses, statuses.values.exists(_ != Succeed))
  }

  /** Poll until `getRevision() >= target` or `maxWaitMs` elapses; the
    * initial check runs before any sleep, so an already-applied revision
    * never sleeps (schema_revision.go:115-135). */
  private def awaitRevision(getRevision: () => Long, target: Long,
      maxWaitMs: Long): Boolean = {
    if (getRevision() >= target) return true
    if (maxWaitMs <= 0) return false
    val deadline = System.currentTimeMillis() + maxWaitMs
    var backoff = 10L
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(math.min(backoff,
        math.max(1L, deadline - System.currentTimeMillis())))
      if (getRevision() >= target) return true
      backoff = math.min((backoff * 3) / 2, 1000L)
    }
    false
  }

  private def catalogRevision(spark: SparkSession, root: String)(
      name: String, group: String): Option[Long] =
    CatalogStore.get(spark, root, group, name).map(_.revision)

  /**
   * Gated query against a catalog root: when the gate short-circuits, the
   * result is `(statuses, None)` — the caller renders empty elements plus
   * the status map; otherwise `(statuses, Some(q))` with every gated
   * group SUCCEED (the map may be empty when nothing was gated).
   */
  def gatedQuery(spark: SparkSession, root: String, groups: Seq[String],
      name: String, groupModRevisions: Map[String, Long],
      maxWaitMs: Long = 0L)(q: => DataFrame): (Map[String, Status], Option[DataFrame]) = {
    val (statuses, shortCircuit) = check(groups, name, groupModRevisions,
      catalogRevision(spark, root), maxWaitMs)
    if (shortCircuit) (statuses, None) else (statuses, Some(q))
  }

  /**
   * Gated write (write_gate.go): a single (group, resource) write carrying
   * the client's schema revision. Zero skips the check and succeeds
   * (write_gate.go:357); stale → EXPIRED_SCHEMA; ahead that never applies
   * → SCHEMA_NOT_APPLIED. The write runs ONLY on SUCCEED.
   */
  def gatedWrite(spark: SparkSession, root: String, group: String,
      name: String, modRevision: Long, maxWaitMs: Long = 0L)(
      w: => Unit): Status = {
    val (statuses, shortCircuit) = check(Seq(group), name,
      if (modRevision == 0L) Map.empty else Map(group -> modRevision),
      catalogRevision(spark, root), maxWaitMs)
    val st = statuses.getOrElse(group, Succeed)
    if (!shortCircuit) w
    st
  }
}
