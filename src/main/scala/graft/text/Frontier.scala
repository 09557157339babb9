package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-aware crawl-frontier scheduling: assign every URL a fetch
  * wave such that NO HOST APPEARS TWICE IN A WAVE — wave r holds each
  * host's r-th URL in priority order. A fetcher that drains waves in order
  * touches a host at most once per wave, so per-host request spacing is
  * wave duration by construction (the frontier-side politeness guarantee;
  * rate limiting inside a wave stays the fetcher's job).
  *
  * Plan: ONE window partitioned by host. The group being a single host's
  * URLs is the point — the 10⁸-URL mega-host is exactly what the schedule
  * exists to space out, its group sorts locally in its own task, and no
  * global frontier ordering is ever materialized (a global priority sort
  * would be both a full-corpus sort AND wrong: it lets one hot host
  * monopolize consecutive fetch slots).
  */
object Frontier {

  /** (…, wave) — the input columns plus the 1-based wave number per URL:
    * `row_number` within host ordered by (priority, url); ties beyond the
    * unique url column cannot occur. */
  def waves(urls: DataFrame, hostCol: String, urlCol: String,
      priorityCol: String): DataFrame = {
    val w = Window.partitionBy(hostCol)
      .orderBy(col(priorityCol).asc, col(urlCol).asc)
    urls.withColumn("wave", row_number().over(w).cast("long"))
  }
}
