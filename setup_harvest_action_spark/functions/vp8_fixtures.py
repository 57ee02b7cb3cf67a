"""REAL lossy-VP8 WebP fixtures (generated — see
tools/gen_vp8_fixtures.py for provenance/regeneration).

Each entry: (payload base64, width, height, md5 of the
decoded y+u+v planes — conformance-pinned, see generator)."""

import base64

VP8_FIXTURES = {
    "photo_q75": (
        "UklGRuoBAABXRUJQVlA4IN4BAAAwDwCdASpAADAAPpE6mEgloyKhLVZskLASCWwAnTKE"
        "ft/G/jl+M3ygVV/DbUKRqwI8wCrFp87J3u0vPF4tSs+TyacbqRDXpdiR/hGRDDYLjIF8"
        "NRYa3RvumQeu2onjecVU9wWMdsy7VBgc55BetCPDAhmr8XwnA7HDqA8zMbetLwAAAPz4"
        "mV5gYc+yqRr1i2228zf2RiY0fEQKfNE//4xX0AjiZi5ix9fHtrkSHMTkjMzYFk1mSW5J"
        "b7gfoC2WjgJfR4iCRxuX9zCsvaWuh9/rANlSdAw3pVlR7xVfpkPyKmgzHMZpbFudzK/0"
        "0wB+di7Zwz+7Y+I7X/vakaOR3es+uq05YoY5pbgzItYy69aduxrh8bAhUu/QThh1LROn"
        "B0uG7HrWtlIIpOGQWKRawOqTcSwb4DEPckqm5rUylqu+A06M7iEaEh5S6m/JgWhlgd/p"
        "TInOXnXJwcWoG3Wx9drhg6xxGaoRh1ZODu/kb9P1u/phmUGbtMDz8xt2kD7OjsJXNCAH"
        "QGdMeOZ9nOvwjUxa9IgzIWRutEk1FISZEnrH+inxXp5c0wXTVnEJR4o68TeT/bKEzVaq"
        "CJidih3Zwxz0iUuQ41Q3ItuOt6hw78YyW+AhjTc9Gvw5Tsr9AAAA"
        , 64, 48, "07317971f2b80e57fb36dcf57afa830a"),
    "photo_q30": (
        "UklGRh4BAABXRUJQVlA4IBIBAACwCgCdASpAADAAPxGAtFYsJ6SjpWppgCIJbACdM2zR"
        "ZrpFE/qTOm6qhPZyEDKXGROHgFjf+U3/Es/ppg+Z5VqNOyQWeqEwyH0RPuoI9J68qWIw"
        "wDE7jkCPPdgL0QgAAOHxdQS7/07mHyN7r27//BskA49Ww8ELRK9me/eyA5+ZGlyOqSna"
        "VFOYx4nQakh6D4vkv7Tf4WRzNK/E9h88OGUYlxV7/xEKPbCGUitSBeSDfyQhL0gpbEDo"
        "DfDNFTeLGcTy7OszPhg3cx/JGirgl57SeUYsYfeE91eB91JobexZ8p0Hm47WiA5dnYI2"
        "KuA7IYkn1b8Si0BvSKVzul1zL4ElQ195A7qxKe8Io37mF5S0iIAA"
        , 64, 48, "646dc2e9b1ef69f9f465201cbaaa5940"),
    "gradient_q90": (
        "UklGRtoAAABXRUJQVlA4IM4AAAAwBwCdASowADAAPjEUiEKiISEXFAAgAwSzAE6Zkv2T"
        "3r8dJbcmoor71FzPrKbk5gk4TBKCKb29uB/6hVyvFG7/ugAA/v/+yIC8uk0RD9HSxqmN"
        "PkJUm3F41izLL2Bf8YqxYUfTTno3l8xHHutU3rRgphEryahNil+b3o60MptBpWLI9scV"
        "PUydR9xPTQ3zHeaxYO+vn6QHwUfo7b/fBOtkVyJIGIyf+3kqgl2k+3H87WKZ+JJqixU8"
        "sXpfz4z4QSJr1FcGOYG3pslIlQAAAA=="
        , 48, 48, "192758924daff9fcefd79ffeef0c1cce"),
    "blocks_q50": (
        "UklGRioBAABXRUJQVlA4IB4BAACQDACdASpQADAAAsBMJbAZwUAHwA/AH4AfgBEf/mA/"
        "on8A3QH4B/APwA6v9k6138z/ADn6ovdJ/Av8i+qa4K7G/kBmLHgH4z/Nv4B/AN4A///p"
        "/2//dAP4B/////w//V/hMPL6JYRL/mEjTaRwAP7aTAxgNtwIpgyBbSHFNFYPZuk/PC++"
        "Z5hzMxwqtdmcpfAPJj2fjFLHXajAhg8OknKfkKIZRpTgbY0/N97rSshu+bjcawn409yJ"
        "J1OLqPAetUVfl1r+ngACkOJ0TA/3Je9vYMcUTPr3Je9vGlY+gDMBw4d7DQor+iZ9hsY7"
        "5vR790upQW8d8ziOhd36TiDIebSefJZE9JsPKd5dG6gBDVaorZtH/7a7FTHSPVskAAAA"
        , 80, 48, "e198f1c95e8dbda1895b10c4c23e527d"),
    "noise_q40": (
        "UklGRo4DAABXRUJQVlA4IIIDAAAQDgCdASowACAAA4BaJbACdMoQQF7Njh7Aj/foA2wH"
        "O4+gDeAN4N/ue8AaYKwFy/gBnAbIL/P+69gVWLSA4fO8G+LdCP/EeIL6C9gLyt/Wx+zn"
        "sbfsiT05phrttNVAH+ZiccUEN53xXNmTd8Q5XLP9ho+SgFOuD8gAANAMvIaM7MrBZdee"
        "qM00NujUuwg2RTyvUaJYuyRMqry6d5ct8TXryr0+v7okRVf3pPKdxfM50gMt8EpKz0SJ"
        "eMQE1m6a903DZiZomMMY80G5rZ/t+n0w9le2zYMhfKQXj8zI4fjnodVv+fpR23M0IOCb"
        "G2VCIAk9sWz6YEKj4bUaxEaZxhO8hmS5h6ccWHgEHvHsvWV6zkuL326EK9jKbGoYDE+Q"
        "5lZABMdbwbKZgqiDt3RfBlAhf8764QEP2W6E8n1jK5Z6rZgo4qrOaBa54q8uunqU+dxD"
        "GaPur47yQeHCy8Uk4XyvquisTNZP/EAbJMchu44NLe7VrdmUDpnlZhewD+dkq1VU5ZiZ"
        "ez2J1F7+Ntmchz302Iwps0sP3MOvFYKMSDoXfvQwtX5+9uolLtWHkvZznkcFEGfSwU6t"
        "zNx4FA/LhWg6kieyUHQqBKLWX0O9tAwQ9LR008m5Xk1f+ZUMwM09oEHUwTP/eVo7IOQD"
        "V0Uyy/uWN6tcT+mhIl7+ek2DO54kxEQx1oYuRL/oOby1vL0jPaKJviBTf9s3XmQ0aFZf"
        "W+DzgSH/rbin56t7zan62gljZrFFlPnsMfPuqVOV51SsNmbyS9F2wiIjzSeZFHNCT/R2"
        "xcAqwcqBLpNEbASeB+y9YiMohL9xsDjZ9D25fTn/eP+OeKBFev7TXYNf4uvzN9E/aMAO"
        "ThHPc7lmrUHvLosRxQNxTjb6wgBYEI/7vexndZC277iZ0kzjoowTRql3YjfCEppduk43"
        "536wE4U5dsAMr8VJ/FEgbHfjsmesF0nWn8AN+fsBOa2+n/ihYJqi0UzJKYvDHJc9v4ct"
        "/9ChcM4/bu/h/v8SKn6FPes4hrFoZ7347ajDTXw7TtQkxdh9WyIrSlV3ruQN8Faa4Dnb"
        "AIVUoQqbtEkjBgxJKSRM4D5XjzJNEpJ2GdBv3Yq+JR56Dj+QhYPjXWjHxI1t5kwyyeBh"
        "P0xD8yh2RyseQnwArv61l0UTaTIv7LOTM+zr9G3BU/O2oks20Gcu/Epj/u9VNONWTRgA"
        , 48, 32, "e08b68ac699ae9c35567b2230b1b2bb1"),
    "crop_q75": (
        "UklGRooAAABXRUJQVlA4IH4AAADQBACdASohABEAPn0ykkekoyGhOrmYAJAPiWYAnTKE"
        "eqhjA6JXKMuB9CckPfjlGAD+/GtPCMjrxnHeUc5FAo+t9QzRVI7uBqxF/0dffvCIv5ik"
        "jQDsnQ0Oq18dlU99x9YaMScq17Qmoz9AMTQOS5tJ5iIPKHpV1nEWT5EOgAA="
        , 33, 17, "30749577e7af14125e38e99206c57d91"),
    "simple_filter_q60": (
        "UklGRpIBAABXRUJQVlA4IIYBAAASDgCdASpAADAAPrVMnkopJaOiLVmclSAWiWwAnTNH"
        "OdfQfirzs3Jj6Fw64Y8wA5v4zHTs/nti54jqUNviXOwVNRaZBQbg8ZsUmXPnpA6lt5lj"
        "DDlMSV2038P570DTvVzuGGizn0AU744S0ge4Yt0kZPMZDhkOXcaAAPkcIObAOWRasRh1"
        "WtSk3Zpn4ULDqNYYOJtU3/3xW21ZoiNjrqM1dKb+AiNI1jcimvntSk63RIgDBftkr5eN"
        "j0aL84HALcW/HIbg88GO4jX9fnlYHpJE5PScArr/qSI7xakQmJwpwCoXnfUIbqxdGVqN"
        "GQLSgBjpH1oQi/UMHxMLgG8xToD1x0Ao2E7r4EMXMD2fjb/k0RGjK02+jEh3+EubasZ2"
        "0bO1/TsbOXtWRW+j/DEzI70kzBXAjZZQn6Nf3xzsy1D0Q4W+dDa4T9xS2K1EWs7R69hK"
        "GhKv7xFw2IrC+rn7isRnmCgErayp6Xh1yODZFlToGtXqCC9D3epG2YNJQO7PD1PeYp+A"
        "AAA="
        , 64, 48, "4e6db8568d8b490d742cdf349ecad1dc"),
    "parts8_seg1_q70": (
        "UklGRrACAABXRUJQVlA4IKQCAACwEQCdASpgAEAAAkA4JaQCdMqD2H8X5k9ffveuXEa7"
        "l8fHqp/Q2+E8tjq/44e2v86fsU94iLyzfVEs24Ld/YaszIIbzj4++y8f30PxmBQlcKuG"
        "CO8x/b9ZyhxfCPN4kP0fESPPR+3tcn+0dT0yGqyv9QutfrttOvncRcvCW/MARm6Y8Daj"
        "WBuqN9BEoKiiX4eSHQ43AwAA+0vvJkstN9llY7GeKW6aabDA/Jc/rePhjr216BJZbxTL"
        "FaVqJnuG3SuUDE9Lx7PDFKjp0RNWcATL2KCYuGZMPPRez8NURA7IW5sq8IVZt3bRfw8C"
        "6xd8qGYkMEAvUz2lotxcAWZENT2UqUyi4rzAX2B26AB3Iy1L+OovM3n4hasHtogyBTI2"
        "xXR2qXItzk7nQpytW1hGilDwU6QrcE/caEBcNbYnQX2oVnaRDv8CqtBOrVSG45e18Zij"
        "OR9MDk7qJZ4O8Qrzwuy8igihCcrgWFwu1yy8tgQDLkmGsDx/D7FuzoK4whH6By3Xwnii"
        "8O8PiFruMQhyKpMcSyDhg0lIFr7y7vqTlwVgGfp3z/T2FkaucUfuRH41GSVr+dElAQMh"
        "IgrGuz4+Sd9YLXWN3VM3kusOkrJDDK2WNrDiACQjbZE2YNR1oExIkCzR4ccUXFKljrC0"
        "AB/AzYyrL2YrcoQrDrb7to2/NASHVZI9nyxlsT8pp4I759KS6h53SbmMP0Ky2EfZTpB4"
        "q8MjWH5T/0FK8x+BU2i632wD5DdehQvdoQrguqwGC4NDtNw0ZYqchMPn5D9SXck6bz6V"
        "RsWYHKaeiJ73pkBrRqo5t7Gt9+DIsBCCi6uHald24iW80ihHHV6n5hVYzWnyRCd5wagw"
        "jB8N4jpawpPA2GTLoHZJMlOf+ZOeqp+Std/FX+CSgAAA"
        , 96, 64, "8b7c4840e7b9c4a1fbe8ebe97a1d6e5f"),
}


def fixture_payload(name: str) -> bytes:
    b64, _, _, _ = VP8_FIXTURES[name]
    return base64.b64decode(b64)
