"""Config system: YAML -> nested dict with full CLI overridability.

Parity surface with the reference's parser_utils.py:11-161 (2-level
group mirror: ``prepare_parser_from_dict`` / ``parse_args_as_dict``), plus
a cleaner any-depth override syntax ``--a.b.c=value`` used by the new
CLIs. The resolved config is frozen to ``conf.yml`` in the experiment dir
like audio_train.py:102-109.
"""

from __future__ import annotations

import argparse
import copy
import sys

import yaml


def isint(value):
    try:
        int(value)
        return True
    except (TypeError, ValueError):
        return False


def isfloat(value):
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        return False


def str_int_float(value):
    if isint(value):
        return int(value)
    if isfloat(value):
        return float(value)
    return value


def str2bool(value):
    if not isinstance(value, str):
        return value
    if value.lower() in ("yes", "true", "y", "1"):
        return True
    if value.lower() in ("no", "false", "n", "0"):
        return False
    return value


def str2bool_arg(value):
    value = str2bool(value)
    if isinstance(value, bool):
        return value
    raise argparse.ArgumentTypeError("Boolean value expected.")


def _entry_type(value):
    if value is None:
        return str_int_float
    if isinstance(str2bool(value), bool):
        return str2bool_arg
    return type(value)


def prepare_parser_from_dict(dic, parser=None):
    """Mirror a 2-level config dict into argparse groups
    (parser_utils.py:11-49)."""
    if parser is None:
        parser = argparse.ArgumentParser()
    for k, v in dic.items():
        group = parser.add_argument_group(k)
        if isinstance(v, dict):
            for kk, vv in v.items():
                group.add_argument("--" + kk, default=vv,
                                   type=_entry_type(vv))
        else:
            group.add_argument("--" + k, default=v, type=_entry_type(v))
    return parser


def parse_args_as_dict(parser, return_plain_args=False, args=None):
    """Re-assemble grouped args into a nested dict
    (parser_utils.py:123-161)."""
    ns = parser.parse_args(args=args)
    args_dic = {}
    for group in parser._action_groups:
        group_dict = {a.dest: getattr(ns, a.dest, None)
                      for a in group._group_actions}
        args_dic[group.title] = group_dict
    for legacy in ("optional arguments", "options", "positional arguments"):
        if legacy in args_dic:
            args_dic.setdefault("main_args", {}).update(args_dic.pop(legacy))
    if return_plain_args:
        return args_dic, ns
    return args_dic


# ---------------------------------------------------------------------------
# Any-depth dotted overrides (the new CLIs' mechanism)
# ---------------------------------------------------------------------------


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f)


def save_yaml(path, config):
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def apply_overrides(config, overrides):
    """Apply ['a.b.c=value', ...] onto a nested dict (copied)."""
    config = copy.deepcopy(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override {item!r} must be key.path=value")
        path, raw = item.split("=", 1)
        keys = path.lstrip("-").split(".")
        node = config
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        val = yaml.safe_load(raw)
        node[keys[-1]] = val
    return config


def parse_config(argv=None, default_conf=None):
    """CLI: --conf_dir <yaml> [k.ey=val ...] -> resolved nested dict."""
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--conf_dir", default=default_conf,
                        help="Path to the YAML config")
    ns, rest = parser.parse_known_args(argv)
    config = load_yaml(ns.conf_dir) if ns.conf_dir else {}
    bad = [a for a in rest if "=" not in a]
    if bad:
        raise SystemExit(
            f"Unrecognized arguments {bad}; overrides must be key.path=value")
    config = apply_overrides(config, rest)
    config.setdefault("main_args", {})["conf_dir"] = ns.conf_dir
    return config
