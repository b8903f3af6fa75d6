package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.FeatureDef

/** Test fixture for dynamic definition loading: a user feature
  * definition living OUTSIDE ConfigParser.registry, reachable only via
  * its fully-qualified class name (zero-arg class form). */
class UserScaleDef extends FeatureDef {
  val name = "user_scale"
  def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame =
    deps.head.withColumn("scaled",
      col(params("value")) * params.getOrElse("factor", "2").toDouble)
}

/** Companion-object form (FQCN with or without the trailing '$'). */
object UserScaleObjDef extends FeatureDef {
  val name = "user_scale_obj"
  def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame =
    deps.head.withColumn("scaled", col(params("value")) * 3.0)
}

/** Shadowing fixture: a zero-arg companion CLASS that is not a
  * FeatureDef next to a companion OBJECT that is — resolution must
  * fall through to the object form. */
class ShadowedDef {
  val notADefinition = true
}

object ShadowedDef extends FeatureDef {
  val name = "shadowed"
  def transform(deps: Seq[DataFrame], params: Map[String, String]): DataFrame =
    deps.head
}
