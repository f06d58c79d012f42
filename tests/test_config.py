"""Layered configuration (reference: ReportingProperties.java:43-127):
defaults -> defaults file -> local overrides -> environment, later wins."""

from datetime import timedelta

from qucosa_fcrepo_reportingdb_spark.config import (
    DEFAULTS,
    ReportingConfig,
    load_properties,
    parse_properties,
)


def test_parse_properties_comments_and_whitespace():
    text = """
# comment
! also comment
oai.url = http://example.org/oai
oai.pollseconds=120

badline-without-equals
"""
    assert parse_properties(text) == {
        "oai.url": "http://example.org/oai",
        "oai.pollseconds": "120",
    }


def test_precedence_defaults_file_local_env(tmp_path):
    d = tmp_path / "default.properties"
    d.write_text("oai.pollseconds=100\nmets.pollseconds=200\n")
    l = tmp_path / "local.properties"
    l.write_text("oai.pollseconds=300\n")
    merged = load_properties(str(d), str(l),
                             env={"oai.pollseconds": "400"})
    # env > local > defaults file > baked-in
    assert merged["oai.pollseconds"] == "400"
    assert merged["mets.pollseconds"] == "200"       # defaults file
    assert merged["oai.url"] == DEFAULTS["oai.url"]  # baked-in survives


def test_missing_files_are_optional(tmp_path):
    merged = load_properties(str(tmp_path / "nope.properties"), None, env={})
    assert merged == DEFAULTS


def test_env_underscore_spelling_maps_to_dotted():
    merged = load_properties(env={"REPORTING_OAI_POLLSECONDS": "42",
                                  "REPORTING_UNRELATED_KEY": "x",
                                  "PATH": "/usr/bin"})
    assert merged["oai.pollseconds"] == "42"
    assert "unrelated.key" not in merged


def test_typed_getters_and_pipeline_kwargs():
    cfg = ReportingConfig.load(env={
        "oai.pollseconds": "120",
        "oai.fc3compatibility": "false",
        "oai.runresulthistorylengthhours": "24",
        "pipeline.batchsize": "50",
        "mets.minwaitseconds": "0.5",
    })
    assert cfg.oai_poll_interval == timedelta(seconds=120)
    assert cfg.fc3_compatibility is False
    assert cfg.run_result_history_length == timedelta(hours=24)
    assert cfg.pipeline_kwargs() == {
        "batch_size": 50,
        "mets_min_wait_s": 0.5,
        "fc3_compatibility": False,
        "history_length": timedelta(hours=24),
    }


def test_reference_default_values_survive():
    # the reference's default.properties values are the baked-in layer
    cfg = ReportingConfig.load(env={})
    assert cfg.oai_poll_interval == timedelta(seconds=360)
    assert cfg.fc3_compatibility is True
    assert cfg.mets_poll_interval == timedelta(seconds=600)
    assert cfg.run_result_history_length == timedelta(hours=48)


def test_env_dotted_key_beats_prefixed_spelling():
    """When BOTH spellings of a key are set, the exact dotted key wins
    deterministically (not os.environ iteration order)."""
    from qucosa_fcrepo_reportingdb_spark.config import load_properties

    env = {"REPORTING_OAI_POLLSECONDS": "600", "oai.pollseconds": "120"}
    assert load_properties(env=env)["oai.pollseconds"] == "120"
    env2 = {"oai.pollseconds": "120", "REPORTING_OAI_POLLSECONDS": "600"}
    assert load_properties(env=env2)["oai.pollseconds"] == "120"


def test_auto_compact_files_knob():
    from qucosa_fcrepo_reportingdb_spark.config import ReportingConfig

    assert ReportingConfig.load(env={}).auto_compact_files == 64
    cfg = ReportingConfig.load(env={"store.autocompactfiles": "8"})
    assert cfg.auto_compact_files == 8
    off = ReportingConfig.load(
        env={"REPORTING_STORE_AUTOCOMPACTFILES": "0"})
    assert off.auto_compact_files is None
