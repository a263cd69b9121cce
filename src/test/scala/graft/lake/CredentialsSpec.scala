package graft.lake

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** O-26 TTL credential cache: at most one fetch per key per TTL window,
  * bounded size, single-flight under concurrency (utils.py:32-37,91-99).
  */
class CredentialsSpec extends AnyFunSuite with Matchers {

  test("caches per key within the TTL window") {
    val fetches = new AtomicInteger(0)
    val c = new TtlCache[String, String](
      k => { fetches.incrementAndGet(); s"v:$k" })
    c.get("a") shouldBe "v:a"
    c.get("a") shouldBe "v:a"
    c.get("b") shouldBe "v:b"
    fetches.get() shouldBe 2
    c.stats shouldBe ((1L, 2L))
  }

  test("expires entries after the TTL and refetches") {
    var now = 0L
    val fetches = new AtomicInteger(0)
    val c = new TtlCache[String, Int](
      _ => fetches.incrementAndGet(), ttlMillis = 600000L, maxSize = 10,
      clock = () => now)
    c.get("k") shouldBe 1
    now = 599999L
    c.get("k") shouldBe 1 // still cached at ttl - 1ms
    now = 600001L
    c.get("k") shouldBe 2 // expired -> refetched
    fetches.get() shouldBe 2
  }

  test("evicts least-recently-used entries beyond maxSize") {
    val fetches = new AtomicInteger(0)
    val c = new TtlCache[Int, Int](
      _ => fetches.incrementAndGet(), maxSize = 3)
    (1 to 3).foreach(c.get)
    c.get(1) // touch 1 -> eviction order is now 2, 3, 1
    c.get(4) // evicts 2
    c.size shouldBe 3
    val before = fetches.get()
    c.get(1); c.get(3); c.get(4) // all still cached
    fetches.get() shouldBe before
    c.get(2) // was evicted -> refetch
    fetches.get() shouldBe before + 1
  }

  test("expired entries are evicted before live ones") {
    var now = 0L
    val c = new TtlCache[Int, Int](identity, ttlMillis = 100L, maxSize = 3,
      clock = () => now)
    c.get(1); c.get(2)
    now = 200L // 1 and 2 expire
    c.get(3); c.get(4) // capacity pressure removes the expired, not 3
    c.get(3)
    c.stats._1 should be >= 1L // 3 was still cached
    c.size should be <= 3
  }

  test("concurrent first readers of one key share a single fetch") {
    val fetches = new AtomicInteger(0)
    val ready = new CountDownLatch(8)
    val c = new TtlCache[String, Int](_ => {
      Thread.sleep(50); fetches.incrementAndGet()
    })
    val pool = Executors.newFixedThreadPool(8)
    val results = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = { ready.countDown(); ready.await(); c.get("shared") }
      })
    }
    results.map(_.get(10, TimeUnit.SECONDS)).toSet shouldBe Set(1)
    fetches.get() shouldBe 1
    pool.shutdown()
  }

  test("invalidate forces a refetch") {
    val fetches = new AtomicInteger(0)
    val c = new TtlCache[String, Int](_ => fetches.incrementAndGet())
    c.get("k") shouldBe 1
    c.invalidate("k")
    c.get("k") shouldBe 2
  }

  test("apiKeys resolves per-key parameter paths through one cache") {
    val paths = scala.collection.mutable.ArrayBuffer[String]()
    val c = new TtlCache[String, String](k => { paths += k; s"secret($k)" })
    val keys = Credentials.apiKeys(c)
    keys.keySet shouldBe Set("User_id", "Password", "CustomerNumber")
    keys("Password") shouldBe "secret(/synnex/dev/Password)"
    // second assembly is fully cached
    Credentials.apiKeys(c) shouldBe keys
    paths.size shouldBe 3
    // reference defaults preserved
    TtlCache.DefaultTtlMillis shouldBe 600000L
    TtlCache.DefaultMaxSize shouldBe 4196
  }
}
