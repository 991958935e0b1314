import os
import textwrap

from proxytransformation_tpu.utils import Config, Registry


def test_config_base_inheritance(tmp_path):
    base = tmp_path / 'base.py'
    base.write_text(textwrap.dedent('''
        lr = 0.1
        model = dict(type='A', depth=3, sub=dict(x=1))
    '''))
    child = tmp_path / 'child.py'
    child.write_text(textwrap.dedent('''
        _base_ = ['base.py']
        model = dict(sub=dict(y=2))
        extra = [1, 2]
    '''))
    cfg = Config.fromfile(str(child))
    assert cfg.lr == 0.1
    assert cfg.model['type'] == 'A'
    assert cfg.model['sub'] == dict(x=1, y=2)
    assert cfg.extra == [1, 2]


def test_cfg_options_merge():
    cfg = Config({'a': {'b': 1}, 'c': 2})
    cfg.merge_from_dict(Config.parse_cfg_options(['a.b=5', 'd=hello',
                                                  'e=[1,2]']))
    assert cfg.a['b'] == 5
    assert cfg.d == 'hello'
    assert cfg.e == [1, 2]


def test_registry_build():
    REG = Registry('test')

    @REG.register_module()
    class Foo:
        def __init__(self, x, y=2):
            self.x, self.y = x, y

    obj = REG.build(dict(type='Foo', x=1))
    assert obj.x == 1 and obj.y == 2
