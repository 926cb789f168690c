package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop
import org.scalacheck.{Test => SCTest}
import graft.sources.EmailMapping

/** Salted-hash parity (FIXTURES.md §A1): engine output must equal Python
  * `hashlib.sha256(salt.encode()+email.encode()).hexdigest()` — i.e. SHA-256
  * over UTF-8 bytes of salt‖email, lowercase hex. MessageDigest is the
  * ground truth here (bit-identical to hashlib). */
class HashParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def pyHash(salt: String, email: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest((salt + email).getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def engineHash(salt: String, email: String): String = {
    val df = Seq(("u", email)).toDF("username", "email")
    EmailMapping.saltedHash(df, salt).select("email").as[String].head()
  }

  test("known vectors incl. unicode emails") {
    val vectors = Seq(
      ("salt", "user@example.com"),
      ("", "a@b.c"),
      ("pepper::", "Ünïcødé@exämple.com"),
      ("s", "日本語@example.jp"),
      ("long-salt-" * 10, ""))
    for ((salt, email) <- vectors)
      assert(engineHash(salt, email) == pyHash(salt, email), s"mismatch for ($salt, $email)")
  }

  test("hash determinism and hex format for arbitrary strings") {
    val prop = Prop.forAll { (salt: String, email: String) =>
      val h = pyHash(salt, email)
      h.length == 64 && h.forall(c => "0123456789abcdef".contains(c)) && h == pyHash(salt, email)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.toString)
  }

  test("engine matches hashlib on a random sample via Spark") {
    val rows = (0 until 20).map(i => (s"user$i", s"user$i+tag@example-$i.org"))
    val df = rows.toDF("username", "email")
    val out = EmailMapping.saltedHash(df, "SALT!").select("username", "email")
      .as[(String, String)].collect().toMap
    for ((u, e) <- rows) assert(out(u) == pyHash("SALT!", e))
  }
}
