"""Log4j2 deny-filter install (session.py): the idempotence guard is
scoped to OUR RegexFilter, so a user-provided unrelated filter on the
same logger no longer suppresses the install (round-9 advisor,
session.py:98), while repeat calls still do not stack filters."""

from __future__ import annotations

from hha_spark.session import _deny_logger_message, _filter_chain_has_regex

_REGEX = r".*test deny pattern [\d_]+.*"


def _jvm(spark):
    return spark.sparkContext._jvm


def _logger_cfg(jvm, name):
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    return ctx.getConfiguration().getLoggerConfig(name)


def _count_regex_filters(flt, regex):
    if flt is None:
        return 0
    name = flt.getClass().getSimpleName()
    if name == "CompositeFilter":
        return sum(
            _count_regex_filters(f, regex) for f in flt.getFiltersArray()
        )
    return 1 if (name == "RegexFilter" and regex in flt.toString()) else 0


def test_deny_filter_installed_and_idempotent(spark):
    jvm = _jvm(spark)
    logger = "hha.test.deny.fresh"
    _deny_logger_message(jvm, logger, _REGEX)
    cfg = _logger_cfg(jvm, logger)
    assert cfg.getName() == logger
    assert _filter_chain_has_regex(cfg.getFilter(), _REGEX)
    # second call must not stack another copy
    _deny_logger_message(jvm, logger, _REGEX)
    assert _count_regex_filters(_logger_cfg(jvm, logger).getFilter(), _REGEX) == 1


def test_deny_filter_installs_past_unrelated_user_filter(spark):
    """A pre-existing unrelated filter (user log4j2 config) must not
    short-circuit the install — log4j composes filters."""
    jvm = _jvm(spark)
    logger = "hha.test.deny.prefiltered"
    warn = jvm.org.apache.logging.log4j.Level.WARN
    LoggerConfig = jvm.org.apache.logging.log4j.core.config.LoggerConfig
    cfg_obj = LoggerConfig(logger, warn, True)
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    conf = ctx.getConfiguration()
    conf.addLogger(logger, cfg_obj)
    result = jvm.org.apache.logging.log4j.core.Filter.Result
    unrelated = (
        jvm.org.apache.logging.log4j.core.filter.RegexFilter.createFilter(
            r".*completely unrelated pattern.*",
            None,
            False,
            result.DENY,
            result.NEUTRAL,
        )
    )
    cfg_obj.addFilter(unrelated)
    ctx.updateLoggers()

    assert not _filter_chain_has_regex(cfg_obj.getFilter(), _REGEX)
    _deny_logger_message(jvm, logger, _REGEX)
    chain = _logger_cfg(jvm, logger).getFilter()
    # ours installed alongside the user's, neither clobbered
    assert _filter_chain_has_regex(chain, _REGEX)
    assert _count_regex_filters(chain, r".*completely unrelated pattern.*") == 1
    # and still idempotent on top of the composite chain
    _deny_logger_message(jvm, logger, _REGEX)
    assert _count_regex_filters(_logger_cfg(jvm, logger).getFilter(), _REGEX) == 1
