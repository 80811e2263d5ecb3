"""Rule-file imports with variable substitution (RuleReader.scala:408-446)."""

from pathlib import Path

from odinson_spark.lang.rules import RuleReader


def test_imports_with_var_override(tmp_path):
    (tmp_path / "common.yml").write_text(
        """
vars:
  noun: "[tag=NN]"
rules:
  - name: imported-rule
    type: basic
    pattern: |
      ${verb} ${noun}
"""
    )
    main = tmp_path / "main.yml"
    main.write_text(
        """
vars:
  verb: "[tag=VB]"
rules:
  - name: local-rule
    type: basic
    pattern: |
      ${verb}
  - import: common.yml
    vars:
      verb: "[tag=VBZ]"
"""
    )
    reader = RuleReader()
    rules, _ = reader.rules_from_string(main.read_text(), base_dir=tmp_path)
    by_name = {r.name: r for r in rules}
    assert by_name["local-rule"].pattern.strip() == "[tag=VB]"
    # import-site var overrides the parent; file-local var fills the rest
    assert by_name["imported-rule"].pattern.strip() == "[tag=VBZ] [tag=NN]"


def test_metadata_filter_passthrough(tmp_path):
    text = """
metadataFilters: "lang == 'en' && stars > 5"
rules:
  - name: r
    type: basic
    pattern: |
      foo
"""
    rules, meta = RuleReader().rules_from_string(text)
    assert meta == "lang == 'en' && stars > 5"
    assert rules[0].name == "r"
