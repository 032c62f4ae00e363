package graft.mv

import org.apache.spark.sql.SparkSessionExtensions

/** Wire-up (reference: MaterializedViewExtensions.scala:25-27):
  * `.withExtensions(new MvExtensions)` or
  * `spark.sql.extensions=graft.mv.MvExtensions`. */
class MvExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new MvParser(delegate))
    ext.injectPostHocResolutionRule(session => new MvRewriteRule(session))
  }
}
