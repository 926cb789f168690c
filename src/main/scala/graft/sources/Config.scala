package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Typed, app-keyed pipeline configuration.
  *
  * Reference parity: `email_mapping/email_mapping.py:23-29` loads
  * `{app_name}_settings.yml` and exits 1 if missing; the committed example
  * (`email_mapping/etl_settings.yml:1-6`) nests settings under an app key
  * while the code reads flat keys — the committed layout would KeyError.
  * This loader implements the evident intent: app-keyed YAML, validated at
  * startup with fail-fast errors (SURVEY.md §3.1 quirk note).
  */
final case class EtlConfig(
    appName: String,
    dbUrl: String,
    userTable: String,
    s3Bucket: String,
    hashSalt: String,
    awsAccessKeyId: Option[String],
    awsSecretAccessKey: Option[String])

object EtlConfig {

  /** Load `{app}` section from an app-keyed YAML settings file.
    * Fail-fast: missing file or missing required key throws (the Spark job
    * aborts — the reference's `sys.exit(1)` semantics). */
  def load(path: String, appName: String): EtlConfig = {
    if (!Files.exists(Paths.get(path)))
      throw new IllegalArgumentException(s"settings file not found: $path")
    // Yaml.load returns null for an empty/comment-only document and a
    // scalar for non-mapping YAML — both must fail with a CLEAR message,
    // not an NPE/ClassCastException downstream
    val loaded: Any = new org.yaml.snakeyaml.Yaml()
      .load[Object](Files.readString(Paths.get(path)))
    val root = loaded match {
      case null =>
        throw new IllegalArgumentException(s"settings file is empty: $path")
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Object]]
      case other =>
        throw new IllegalArgumentException(
          s"settings file is not a YAML mapping: $path (got ${other.getClass.getSimpleName})")
    }
    val section = Option(root.get(appName)) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      case Some(_) =>
        throw new IllegalArgumentException(s"settings for '$appName' is not a mapping")
      case None =>
        // flat layout fallback (what the reference code actually read)
        root.asScala.toMap
    }
    def req(k: String): String = section.get(k).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"missing required setting '$k' for app '$appName'"))
    EtlConfig(
      appName = appName,
      dbUrl = req("db_url"),
      userTable = req("user_table"),
      s3Bucket = req("s3_bucket"),
      hashSalt = req("hash_salt"),
      awsAccessKeyId = section.get("aws_access_key_id").map(_.toString),
      awsSecretAccessKey = section.get("aws_secret_access_key").map(_.toString))
  }
}
