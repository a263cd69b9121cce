package graft.lake

/** O-26: TTL-cached credential/config fetch — the reference's SSM
  * parameter cache re-expressed as a plain Scala provider.
  *
  * Reference semantics (`utils.py:32-37` `get_ssm_param`, `utils.py:91-99`
  * `@cached(cache=TTLCache(maxsize=4196, ttl=600)) get_api_keys`): a
  * remote secret store is consulted at most once per key per 600 s window,
  * bounded to 4196 cached entries. The store itself (SSM) is
  * infrastructure outside the engine; the cache contract around it is
  * what jobs depend on (a 1000-executor job must not hammer the secret
  * store once per task), so THAT is what this implements, over a
  * pluggable `fetch` seam.
  *
  * Beyond the reference (whose cachetools decorator is not thread-safe):
  * per-key single-flight — concurrent first requests for one key run ONE
  * fetch and share the result, because on Spark a driver-side cache is hit
  * from listener/streaming/orchestration threads at once
  * ([[Orchestrate]] fans out exactly such work).
  */
final class TtlCache[K, V](fetch: K => V,
                           ttlMillis: Long = TtlCache.DefaultTtlMillis,
                           maxSize: Int = TtlCache.DefaultMaxSize,
                           clock: () => Long = () => System.currentTimeMillis()) {
  require(ttlMillis > 0 && maxSize > 0, "ttlMillis and maxSize must be positive")

  private final class Entry(val value: V, val expiresAt: Long)

  // access-order LinkedHashMap = LRU order for eviction; all map access
  // under `lock` (metadata-sized, driver-side — contention is not a
  // concern, fetch latency is, and fetches happen OUTSIDE this lock)
  private val lock = new Object
  private val entries = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true)
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[K, Object]
  private var hitCount = 0L
  private var missCount = 0L

  /** `countStats=false` for the post-lock re-check, which is the same
    * logical request as the miss that acquired the key lock.
    */
  private def lookup(k: K, now: Long,
                     countStats: Boolean = true): Option[V] = lock.synchronized {
    Option(entries.get(k)) match {
      case Some(e) if e.expiresAt > now =>
        if (countStats) hitCount += 1
        Some(e.value)
      case Some(_) =>
        entries.remove(k)
        if (countStats) missCount += 1
        None
      case None =>
        if (countStats) missCount += 1
        None
    }
  }

  /** The cached value for `k`, fetching (once, even under concurrent
    * callers) when absent or expired.
    */
  def get(k: K): V = {
    lookup(k, clock()) match {
      case Some(v) => v
      case None =>
        val keyLock = inFlight.computeIfAbsent(k, _ => new Object)
        try keyLock.synchronized {
          // re-check: a concurrent caller may have fetched while this one
          // waited on the key lock
          lookup(k, clock(), countStats = false).getOrElse {
            val v = fetch(k)
            lock.synchronized {
              entries.put(k, new Entry(v, clock() + ttlMillis))
              // evict expired entries first (they are dead weight, not
              // recency casualties), then LRU-eldest down to capacity
              val now = clock()
              val it = entries.values().iterator()
              while (it.hasNext) if (it.next().expiresAt <= now) it.remove()
              while (entries.size() > maxSize) {
                val eldest = entries.keySet().iterator()
                eldest.next(); eldest.remove()
              }
            }
            v
          }
        } finally {
          // drop the per-key lock once the burst is over: waiters already
          // hold a reference to THIS object and still serialize on it;
          // keeping it mapped forever would grow inFlight by one entry
          // per distinct key for the cache's whole life — an unbounded
          // leak the maxSize bound on `entries` cannot see. The cost of
          // removal is at most one duplicate fetch when a new caller
          // arrives in the instant between release and re-check.
          inFlight.remove(k, keyLock); ()
        }
    }
  }

  def invalidate(k: K): Unit = lock.synchronized { entries.remove(k); () }
  def invalidateAll(): Unit = lock.synchronized { entries.clear() }
  def size: Int = lock.synchronized { entries.size() }
  /** (hits, misses) — a re-fetch after expiry counts as a miss. */
  def stats: (Long, Long) = lock.synchronized { (hitCount, missCount) }
}

object TtlCache {
  /** `ttl=600` seconds (utils.py:91). */
  val DefaultTtlMillis: Long = 600000L
  /** `maxsize=4196` (utils.py:91). */
  val DefaultMaxSize: Int = 4196
}

/** The `get_api_keys` shape (`utils.py:93-99`): assemble the vendor-API
  * credential map through the TTL cache. The reference reads the SAME
  * parameter path for all three keys (a documented latent bug — the
  * intended semantics are per-key paths, SURVEY §8 pattern); this
  * implements the intent: each key resolves its own `/synnex/<env>/<key>`
  * path, one cached fetch per path per TTL window.
  */
object Credentials {
  def apiKeys(cache: TtlCache[String, String],
              env: String = "dev"): Map[String, String] =
    Seq("User_id", "Password", "CustomerNumber")
      .map(k => k -> cache.get(s"/synnex/$env/$k")).toMap
}
