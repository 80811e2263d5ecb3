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


def test_import_without_base_dir_raises():
    # parity: TestRuleFile.scala "throw an exception with imports in string"
    import pytest

    with pytest.raises(ValueError, match="import used without a base directory"):
        RuleReader().rules_from_string(
            "rules:\n  - import: some/rules.yml\n"
        )


def test_var_precedence_hardcoded_beats_import_site(tmp_path):
    # parity: TestRuleFile.scala "hard-coded > import > parent > local"
    (tmp_path / "leaf.yml").write_text(
        """
vars:
  name: LOCAL
rules:
  - name: leaf-${name}
    type: basic
    pattern: |
      leads
"""
    )
    main = tmp_path / "main.yml"
    main.write_text(
        """
vars:
  name: PARENT
rules:
  - import: leaf.yml
    vars:
      name: IMPORT_SITE
"""
    )
    reader = RuleReader()
    # no hard-coded vars: import-site wins over parent and local
    rules, _ = reader.rules_from_string(main.read_text(), base_dir=tmp_path)
    assert rules[0].name == "leaf-IMPORT_SITE"
    # hard-coded trumps all
    rules, _ = reader.rules_from_string(
        main.read_text(), {"name": "HARD_CODED"}, base_dir=tmp_path
    )
    assert rules[0].name == "leaf-HARD_CODED"


def test_vars_imported_from_file(tmp_path):
    # parity: TestRuleFile.scala "importing vars from filesystem"
    (tmp_path / "vars.yml").write_text("name: IMPORTED_NAME\n")
    (tmp_path / "rules.yml").write_text(
        """
vars: vars.yml
rules:
  - name: B-${name}
    type: basic
    pattern: |
      leads
"""
    )
    reader = RuleReader()
    rules, _ = reader.rules_from_string(
        (tmp_path / "rules.yml").read_text(), base_dir=tmp_path
    )
    assert rules[0].name == "B-IMPORTED_NAME"


def test_circular_import_raises_cleanly(tmp_path):
    import pytest

    (tmp_path / "a.yml").write_text("rules:\n  - import: b.yml\n")
    (tmp_path / "b.yml").write_text("rules:\n  - import: a.yml\n")
    with pytest.raises(ValueError, match="circular rule-file import"):
        RuleReader().rules_from_string((tmp_path / "a.yml").read_text(), base_dir=tmp_path)


def test_diamond_imports_allowed(tmp_path):
    # the same file imported along two branches is not a cycle
    (tmp_path / "x.yml").write_text("rules:\n  - import: shared.yml\n  - import: y.yml\n")
    (tmp_path / "y.yml").write_text("rules:\n  - import: shared.yml\n")
    (tmp_path / "shared.yml").write_text(
        "rules:\n  - name: s\n    type: basic\n    pattern: |\n      hi\n"
    )
    rules, _ = RuleReader().rules_from_string(
        (tmp_path / "x.yml").read_text(), base_dir=tmp_path
    )
    assert [r.name for r in rules] == ["s", "s"]


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
