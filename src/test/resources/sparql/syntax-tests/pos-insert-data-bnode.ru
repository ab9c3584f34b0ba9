PREFIX : <http://x/>
INSERT DATA { :s :p _:b . _:b :q "v" }
