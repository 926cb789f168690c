package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{EmailMapping, EtlConfig}

/** Real JDBC round-trip for the email-mapping source (S1) against an
  * embedded Derby database (ships with Spark), exercising partitioned
  * reads exactly as a Postgres source would. */
class JdbcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("partitioned JDBC extract + salted-hash pipeline end-to-end") {
    // keep derby.log out of the repo root
    System.setProperty("derby.system.home", Files.createTempDirectory("graft-derby-home").toString)
    val dbDir = Files.createTempDirectory("graft-derby").toString + "/userdb"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INT PRIMARY KEY, username VARCHAR(64), email VARCHAR(128))")
      val ps = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      for (i <- 1 to 57) {
        ps.setInt(1, i); ps.setString(2, s"user$i"); ps.setString(3, s"user$i@example.org")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val cfg = EtlConfig("app", url, "users", "bucket", "pepper", None, None)
    val extracted = EmailMapping.extractJdbc(spark, cfg,
      partitionColumn = "id", lower = 1, upper = 57, numPartitions = 4)
    assert(extracted.rdd.getNumPartitions == 4, "JDBC read not partitioned")
    assert(extracted.columns.toSeq == Seq("USERNAME", "EMAIL") ||
      extracted.columns.toSeq == Seq("username", "email"))
    // the projection must reach the SCAN (pushed into the generated JDBC
    // query), not be applied as a post-scan Project over SELECT *
    val scans = extracted.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, "no JDBC scan node in the physical plan")
    assert(scans.head.output.map(_.name.toLowerCase).toSet == Set("username", "email"),
      s"scan reads ${scans.head.output.map(_.name)} — projection not pushed")

    val out = Files.createTempDirectory("graft-jdbc-out").toString
    val normalized = extracted.toDF("username", "email")
    val dest = EmailMapping.run(normalized, cfg, out)
    val result = spark.read.parquet(dest)
    assert(result.count() == 57)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def h(e: String) = md.digest(("pepper" + e).getBytes("UTF-8")).map("%02x".format(_)).mkString
    import spark.implicits._
    val m = result.as[(String, String)].collect().toMap
    assert(m("user7") == h("user7@example.org"))
  }

  test("filter predicates are pushed into the JDBC scan, not applied post-scan") {
    System.setProperty("derby.system.home", Files.createTempDirectory("graft-derby-home").toString)
    val dbDir = Files.createTempDirectory("graft-derby-f").toString + "/userdb"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INT PRIMARY KEY, username VARCHAR(64), email VARCHAR(128))")
      val ps = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      for (i <- 1 to 30) {
        ps.setInt(1, i); ps.setString(2, s"user$i"); ps.setString(3, s"user$i@example.org")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val cfg = EtlConfig("app", url, "users", "bucket", "pepper", None, None)
    val extracted = EmailMapping.extractJdbc(spark, cfg,
      partitionColumn = "id", lower = 1, upper = 30, numPartitions = 2)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val filtered = extracted.filter(col("email") === "user7@example.org")
    // the reference does this pushdown BY HAND (its SQL string carries the
    // WHERE); here Catalyst must push the predicate into the generated JDBC
    // query — visible as PushedFilters on the scan node, with no lingering
    // post-scan Filter over the full table
    val scans = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, "no JDBC scan node in the physical plan")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.toLowerCase.contains("equalto(email,user7@example.org)"),
      s"equality predicate not pushed into the JDBC scan: PushedFilters=$pushed")
    assert(filtered.count() == 1)
    assert(filtered.select("username").as[String].head() == "user7")
  }

  test("PostgresDialect leg: pushed projection + partitioned scan + pushed filter survive Postgres SQL generation") {
    // The reference's real source is Postgres (email_mapping.py:33-41,
    // psycopg2 in email_mapping/pyproject.toml) but only embedded Derby
    // exists in this sandbox. This leg exercises the POSTGRES DIALECT
    // path end-to-end anyway: a shim java.sql.Driver claims
    // jdbc:postgresql: URLs — so Spark selects PostgresDialect and
    // generates Postgres-quoted scan SQL — and delegates execution to
    // Derby, a real SQL engine that parses the same standard-quoted
    // SELECT/WHERE shapes. What this proves: dialect selection, quoted
    // identifier generation, partition WHERE clauses and filter
    // compilation through PostgresDialect all yield executable SQL with
    // the same rows as the Derby-dialect leg. What it cannot prove:
    // pg-specific type mapping on exotic types (no live Postgres).
    System.setProperty("derby.system.home", Files.createTempDirectory("graft-derby-home").toString)
    val dbDir = Files.createTempDirectory("graft-derby-pg").toString + "/userdb"
    val conn = DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INT PRIMARY KEY, username VARCHAR(64), email VARCHAR(128))")
      val ps = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      for (i <- 1 to 41) {
        ps.setInt(1, i); ps.setString(2, s"user$i"); ps.setString(3, s"user$i@example.org")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    DriverManager.registerDriver(new PgShimDriver)
    val pgUrl = s"jdbc:postgresql:$dbDir"
    // dialect selection is by URL prefix — this is the point of the shim
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(pgUrl)
    assert(dialect.getClass.getName.contains("Postgres"),
      s"expected PostgresDialect for $pgUrl, got ${dialect.getClass.getName}")
    assert(dialect.quoteIdentifier("email") == "\"email\"")

    val cfg = EtlConfig("app", pgUrl, "users", "bucket", "pepper", None, None)
    val extracted = EmailMapping.extractJdbc(spark, cfg,
      partitionColumn = "id", lower = 1, upper = 41, numPartitions = 4)
    assert(extracted.rdd.getNumPartitions == 4,
      "partitioned read broke under PostgresDialect SQL generation")
    val scans = extracted.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty, "no JDBC scan node in the physical plan")
    assert(scans.head.output.map(_.name.toLowerCase).toSet == Set("username", "email"),
      s"scan reads ${scans.head.output.map(_.name)} — projection not pushed under PostgresDialect")
    assert(extracted.count() == 41)

    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val filtered = extracted.filter(col("email") === "user7@example.org")
    val fscans = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    val pushed = fscans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.toLowerCase.contains("equalto(email,user7@example.org)"),
      s"filter not pushed under PostgresDialect: PushedFilters=$pushed")
    assert(filtered.select("username").as[String].head() == "user7")
  }
}

/** Test-only JDBC driver: claims `jdbc:postgresql:` URLs (so Spark's
  * dialect registry picks PostgresDialect) and delegates to embedded
  * Derby for execution. Registered via DriverManager in the spec. */
class PgShimDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (!acceptsURL(url)) null
    else DriverManager.getConnection(
      "jdbc:derby:" + url.stripPrefix("jdbc:postgresql:"), info)
  override def getMajorVersion: Int = 42
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = true
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
